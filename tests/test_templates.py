"""Config templates (internal/template/{config,template}.go): Bloblang
macro rendering, field coercion, registration, the reference's entire
template_examples corpus executed verbatim, and end-to-end pipeline use
of a registered template."""

import glob
import json
import subprocess
import sys

import pytest

from bento_ray.config.template import (
    Template,
    TemplateError,
    clear_templates,
    load_templates,
    lookup_template,
    register_template,
)

CORPUS = "/root/reference/config/template_examples"


@pytest.fixture(autouse=True)
def _fresh_registry():
    clear_templates()
    yield
    clear_templates()


@pytest.mark.parametrize("path", sorted(glob.glob(f"{CORPUS}/*.yaml")),
                         ids=lambda p: p.rsplit("/", 1)[-1])
def test_reference_template_corpus(path):
    """Every reference template example parses, compiles its mapping,
    and passes its own embedded tests (expected-config JSON compare +
    type-coercion cases)."""
    tmpl = Template.from_file(path)
    failures = tmpl.run_tests()
    assert failures == [], failures


def test_field_coercion_types():
    tmpl = Template.from_yaml("""
name: coerce
type: processor
fields:
  - name: s
    type: string
  - name: n
    type: int
  - name: f
    type: float
  - name: b
    type: bool
  - name: opt
    type: string
    default: fallback
mapping: |
  root.noop = {}
  root.noop.echo = [this.s, this.n, this.f, this.b, this.opt]
""")
    out = tmpl.render({"s": 10, "n": "42", "f": "2.5", "b": "true"})
    assert out["noop"]["echo"] == ["10", 42, 2.5, True, "fallback"]
    # bools never coerce to numbers
    with pytest.raises(TemplateError):
        tmpl.render({"s": 1, "n": True, "f": 1, "b": True})
    # missing required field
    with pytest.raises(TemplateError, match="missing required"):
        tmpl.render({"n": 1, "f": 1, "b": True})
    # unknown field
    with pytest.raises(TemplateError, match="unrecognised"):
        tmpl.render({"s": "x", "n": 1, "f": 1, "b": False, "zz": 3})


def test_float_string_coercion_matches_reference():
    """20.475 → '20.475' and false → 'false' (the hydration example's
    Type coercion test pins exactly this)."""
    tmpl = Template.from_yaml("""
name: fmt
type: processor
fields:
  - name: a
    type: string
  - name: b
    type: string
  - name: c
    type: string
mapping: |
  root.noop.vals = [this.a, this.b, this.c]
""")
    out = tmpl.render({"a": 20.475, "b": False, "c": 10})
    assert out["noop"]["vals"] == ["20.475", "false", "10"]


def test_template_processor_in_pipeline(ray_session, tmp_path):
    """A registered processor template is usable as a first-class
    processor kind in a YAML pipeline config."""
    from bento_ray.pipelines.builder import Pipeline

    register_template(Template.from_yaml("""
name: double_and_tag
type: processor
fields:
  - name: factor
    type: int
    default: 2
  - name: tag
    type: string
mapping: |
  root.mapping = "root = this\\nroot.v = this.v * %v\\nroot.tag = \\"%v\\"".format(this.factor, this.tag)
"""))
    cfg = """
input:
  generate:
    count: 3
    mapping: |
      root.v = counter()
pipeline:
  processors:
    - double_and_tag:
        factor: 3
        tag: tpl
"""
    rows = sorted(Pipeline.from_yaml(cfg).to_pandas()
                  .to_dict("records"), key=lambda r: r["v"])
    assert [r["v"] for r in rows] == [3, 6, 9]
    assert all(r["tag"] == "tpl" for r in rows)


def test_template_input_in_pipeline(ray_session):
    """An input template renders to a real input plus attached
    input-level processors that run ahead of the pipeline section."""
    from bento_ray.pipelines.builder import Pipeline

    register_template(Template.from_yaml("""
name: numbers
type: input
fields:
  - name: count
    type: int
mapping: |
  root.generate.count = this.count
  root.generate.mapping = "root.n = counter()"
  root.processors = []
  root.processors."-".mapping = "root = this\\nroot.n2 = this.n * this.n"
"""))
    cfg = """
input:
  numbers:
    count: 4
pipeline:
  processors:
    - mapping: |
        root = this
        root.n3 = this.n2 + 1
"""
    rows = sorted(Pipeline.from_yaml(cfg).to_pandas()
                  .to_dict("records"), key=lambda r: r["n"])
    assert [r["n2"] for r in rows] == [1, 4, 9, 16]
    assert [r["n3"] for r in rows] == [2, 5, 10, 17]


def test_gabs_dash_append_in_mapping():
    tmpl = Template.from_yaml("""
name: appender
type: processor
fields: []
mapping: |
  root.noop = {}
  root.items = []
  root.items."-".a = 1
  root.items."-".b = 2
  root.items."-" = "tail"
""")
    out = tmpl.render({})
    assert out["items"] == [{"a": 1}, {"b": 2}, "tail"]


def test_load_templates_glob_and_registry():
    lints = load_templates([f"{CORPUS}/processor_*.yaml"])
    assert lints == []
    assert lookup_template("processor", "hydration") is not None
    assert lookup_template("processor", "log_message") is not None
    assert lookup_template("input", "hydration") is None


def test_cli_template_lint():
    res = subprocess.run(
        [sys.executable, "-m", "bento_ray", "template", "lint",
         f"{CORPUS}/processor_hydration.yaml"],
        capture_output=True, text=True, cwd="/root/repo")
    assert res.returncode == 0, res.stdout + res.stderr
    assert "ok" in res.stdout


def test_hydration_renders_expected_shape():
    """Spot-check the hardest corpus template end to end: the rendered
    config is a try-list of two branch processors whose Bloblang
    request/result maps embed the configured paths."""
    tmpl = Template.from_file(f"{CORPUS}/processor_hydration.yaml")
    out = tmpl.render({"cache": "c1", "id_path": "doc.id",
                       "content_path": "doc.body"})
    body = json.dumps(out)
    assert list(out) == ["try"]
    assert len(out["try"]) == 2
    assert "doc.id" in body and "doc.body" in body and "c1" in body
