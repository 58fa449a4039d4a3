"""Config templates: parameterised component macros rendered via
Bloblang, mirroring the reference's template system
(/root/reference/internal/template/{config,template}.go and the
`bento template lint` CLI).

A template YAML declares ``name`` / ``type`` / ``fields`` /
``mapping`` (+ optional embedded ``tests``). Registering it makes the
new component name usable in configs of that type; at build time the
provided config is field-coerced, fed to the Bloblang mapping as
``this``, and the mapping's structured output becomes the real
component config (template.go Render).

Field coercion follows the docs package's scalar coercion: values are
converted to the declared field ``type`` before the mapping runs (the
reference's hydration example tests exactly this — 10 / false / 20.475
arriving as strings), with Go-style value formatting so ``false``
stays lowercase and integral floats print bare.
"""

from __future__ import annotations

import json

import yaml

from bento_ray.blobl.interp import DELETE, Mapping

# name → Template, per type ("processor" / "input" / "output" / ...)
TEMPLATES: dict[str, dict[str, "Template"]] = {}


class TemplateError(ValueError):
    pass


def _gostr(v) -> str:
    """Go %v-style scalar formatting: lowercase bools, integral floats
    keep their decimal form only when the source had one (floats format
    via repr, which matches Go for round-trippable doubles)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            # Go prints float64(20.0) as "20" under %v
            return str(int(v))
        return repr(v)
    if v is None:
        return "null"
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    return str(v)


def _coerce_scalar(v, ftype: str):
    if ftype == "string":
        return v if isinstance(v, str) else _gostr(v)
    if ftype == "int":
        if isinstance(v, bool):
            raise TemplateError(f"expected int, got bool: {v}")
        if isinstance(v, int):
            return v
        if isinstance(v, float) and v == int(v):
            return int(v)
        if isinstance(v, str):
            return int(v)
        raise TemplateError(f"expected int, got: {v!r}")
    if ftype == "float":
        if isinstance(v, bool):
            raise TemplateError(f"expected float, got bool: {v}")
        if isinstance(v, (int, float)):
            return float(v)
        if isinstance(v, str):
            return float(v)
        raise TemplateError(f"expected float, got: {v!r}")
    if ftype == "bool":
        if isinstance(v, bool):
            return v
        if isinstance(v, str) and v.lower() in ("true", "false"):
            return v.lower() == "true"
        raise TemplateError(f"expected bool, got: {v!r}")
    # unknown / object: pass through untouched
    return v


class Template:
    def __init__(self, doc: dict, source: str = "<inline>"):
        self.source = source
        self.name = doc.get("name") or ""
        self.type = doc.get("type") or ""
        self.summary = doc.get("summary", "")
        self.fields = doc.get("fields") or []
        self.mapping_src = doc.get("mapping") or ""
        self.metrics_mapping_src = doc.get("metrics_mapping") or ""
        self.tests = doc.get("tests") or []
        if not self.name:
            raise TemplateError(f"{source}: template missing name")
        if self.type not in ("input", "processor", "output", "cache",
                             "rate_limit", "buffer", "metrics", "tracer"):
            raise TemplateError(
                f"{source}: unrecognised template type {self.type!r}")
        if not self.mapping_src:
            raise TemplateError(f"{source}: template missing mapping")
        for f in self.fields:
            if "name" not in f:
                raise TemplateError(f"{source}: field missing name")
            if "type" not in f and "default" not in f:
                raise TemplateError(
                    f"{source}: field {f['name']}: missing type field")
        self.mapping = Mapping(self.mapping_src)

    # -- parsing -----------------------------------------------------------
    @classmethod
    def from_yaml(cls, text: str, source: str = "<inline>") -> "Template":
        doc = yaml.safe_load(text)
        if not isinstance(doc, dict):
            raise TemplateError(f"{source}: template must be a mapping")
        return cls(doc, source=source)

    @classmethod
    def from_file(cls, path: str) -> "Template":
        with open(path) as fh:
            return cls.from_yaml(fh.read(), source=path)

    # -- rendering ---------------------------------------------------------
    def coerce_config(self, config: dict | None) -> dict:
        config = dict(config or {})
        out = {}
        declared = set()
        for f in self.fields:
            name = f["name"]
            declared.add(name)
            if name in config:
                v = config.pop(name)
            elif "default" in f:
                v = f["default"]
            else:
                raise TemplateError(
                    f"template {self.name}: missing required field {name}")
            ftype = f.get("type", "unknown")
            kind = f.get("kind", "scalar")
            if kind == "list":
                if not isinstance(v, list):
                    raise TemplateError(
                        f"template {self.name}: field {name} expects a list")
                v = [_coerce_scalar(x, ftype) for x in v]
            elif kind == "map":
                if not isinstance(v, dict):
                    raise TemplateError(
                        f"template {self.name}: field {name} expects a map")
                v = {k: _coerce_scalar(x, ftype) for k, x in v.items()}
            else:
                v = _coerce_scalar(v, ftype)
            out[name] = v
        if config:
            extra = ", ".join(sorted(config))
            raise TemplateError(
                f"template {self.name}: unrecognised fields: {extra}")
        return out

    def render(self, config: dict | None):
        """Coerced config → mapping → the real component config."""
        values = self.coerce_config(config)
        try:
            result = self.mapping.run_value(values)
        except Exception as e:
            raise TemplateError(
                f"mapping failed for template component: {e}") from e
        if result is DELETE or result is None:
            raise TemplateError(
                f"template {self.name}: mapping produced no config")
        return result

    # -- embedded tests (template_test.go / config.go Test) -----------------
    def run_tests(self) -> list[str]:
        """Execute the template's own ``tests:`` blocks. Returns
        failure strings (empty = green). A test with no ``expected``
        only asserts the render succeeds."""
        failures = []
        for test in self.tests:
            tname = test.get("name", "?")
            try:
                rendered = self.render(test.get("config") or {})
            except Exception as e:
                failures.append(f"test '{tname}': {e}")
                continue
            if "expected" in test:
                want = _jsonable(test["expected"])
                got = _jsonable(rendered)
                if want != got:
                    failures.append(
                        f"test '{tname}': mismatch between expected and "
                        f"actual resulting config:\n  expected: "
                        f"{json.dumps(want, sort_keys=True)}\n  actual:   "
                        f"{json.dumps(got, sort_keys=True)}")
        return failures


def _jsonable(v):
    return json.loads(json.dumps(v, sort_keys=True))


def register_template(tmpl: Template) -> None:
    TEMPLATES.setdefault(tmpl.type, {})[tmpl.name] = tmpl


def lookup_template(ttype: str, name: str) -> Template | None:
    return TEMPLATES.get(ttype, {}).get(name)


def clear_templates() -> None:
    TEMPLATES.clear()


def load_templates(paths) -> list[str]:
    """Parse + register template files (globs allowed, as the
    reference's --templates flag). Returns lint warnings."""
    import glob as _glob

    lints: list[str] = []
    expanded: list[str] = []
    for p in paths if isinstance(paths, (list, tuple)) else [paths]:
        hits = sorted(_glob.glob(p, recursive=True))
        expanded.extend(hits if hits else [p])
    for path in expanded:
        tmpl = Template.from_file(path)
        register_template(tmpl)
    return lints
