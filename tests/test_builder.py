"""Declarative Pipeline builder (the config-driven surface)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
from ray.data.aggregate import Count, Sum

from bento_ray.pipelines.builder import Pipeline, register_processor

SF = "/root/testdata/sf0.001"


def test_builder_chain_matches_direct():
    p = (Pipeline.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_returnflag", "l_quantity"])
         .filter(lambda t: pc.greater(t.column("l_quantity"), pa.scalar(40.0)))
         .group_aggregate("l_returnflag",
                          Count(alias_name="n"),
                          Sum("l_quantity", alias_name="qty")))
    df = p.to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    assert set(df.columns) == {"l_returnflag", "n", "qty"}
    assert df["n"].sum() > 0

    import duckdb

    want = duckdb.sql(
        f"SELECT l_returnflag, COUNT(*) n, SUM(l_quantity) qty "
        f"FROM read_parquet('{SF}/lineitem.parquet') "
        f"WHERE l_quantity > 40 GROUP BY 1 ORDER BY 1").df()
    assert df["n"].tolist() == want["n"].tolist()
    assert df["qty"].tolist() == pytest.approx(want["qty"].tolist())


def test_builder_apply_method():
    p = (Pipeline.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "source"])
         .apply("uppercase", "source", out="SRC")
         .limit(5))
    df = p.to_pandas()
    assert (df["SRC"] == df["source"].str.upper()).all()


def test_registered_processor_and_spec():
    @register_processor("double_qty")
    def double_qty(ds, col="l_quantity"):
        return ds.map_batches(
            lambda t: t.set_column(
                t.column_names.index(col), col,
                pc.multiply(t.column(col), pa.scalar(2.0))),
            batch_format="pyarrow")

    spec = {
        "input": {"parquet": {"path": f"{SF}/lineitem.parquet",
                              "columns": ["l_quantity"]}},
        "pipeline": [
            {"double_qty": {}},
            {"limit": {"n": 3}},
        ],
    }
    df = Pipeline.from_spec(spec).to_pandas()
    assert len(df) == 3

    import pyarrow.parquet as pq

    orig = pq.read_table(f"{SF}/lineitem.parquet",
                         columns=["l_quantity"]).to_pandas()
    # every doubled value exists in 2*original (order-insensitive spot check)
    assert set(df["l_quantity"]).issubset(set(orig["l_quantity"] * 2))


def test_stream_manager_crud_and_run(tmp_path):
    """streams mode (stream/manager/type.go:130-233): named pipelines
    with create/read/update/delete + bounded runs."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from bento_ray.pipelines.streams import StreamManager

    pq.write_table(pa.table({"a": [1, 2, 3]}), str(tmp_path / "t.parquet"))
    yml = f"""
input:
  parquet:
    path: {tmp_path}/t.parquet
pipeline:
  processors:
    - mapping: 'root.a = this.a * 2'
"""
    m = StreamManager()
    m.create("s1", yml)
    with _pytest.raises(ValueError):
        m.create("s1", yml)
    assert m.run("s1") == 3
    st = m.list()["s1"]
    assert st["runs"] == 1 and st["last_error"] is None
    m.update("s1", yml)
    m.delete("s1")
    with _pytest.raises(KeyError):
        m.read("s1")


def test_from_yaml_config_registry_bridge(tmp_path):
    """Config-registry processors (javascript, jq, …) unknown to the
    builder compile into ONE actor-pool bridge stage
    (config/stage.py); chain semantics follow run_processors
    (processor_*.go pipeline contract)."""
    p = Pipeline.from_yaml("""
input:
  generate:
    count: 6
    mapping: 'root = {"n": counter()}'
pipeline:
  processors:
    - javascript:
        code: |
          var m = bento.v0_msg_as_structured();
          m.sq = m.n * m.n;
          bento.v0_msg_set_structured(m);
    - jq:
        query: '{sq: .sq, n: .n}'
    - mapping: |
        root = this
        root.half = this.sq / 2
""")
    df = p.to_pandas().sort_values("n").reset_index(drop=True)
    assert df["sq"].tolist() == [1, 4, 9, 16, 25, 36]
    assert df["half"].tolist() == [0.5, 2.0, 4.5, 8.0, 12.5, 18.0]


def test_from_yaml_bridge_cardinality_and_state(tmp_path):
    """split/archive cardinality changes flow through the bridge; a
    cache-referencing chain is forced to one actor so the
    single-process cache visibility of the reference holds."""
    from bento_ray.config.stage import _chain_is_stateful

    assert _chain_is_stateful([{"dedupe": {"cache": "c", "key": "k"}}])
    assert _chain_is_stateful(
        [{"try": [{"cache": {"resource": "c", "operator": "get",
                             "key": "k"}}]}])
    assert not _chain_is_stateful([{"jq": {"query": "."}}])
    p = Pipeline.from_yaml("""
input:
  generate:
    count: 4
    mapping: 'root = {"n": counter(), "k": counter() % 2}'
cache_resources:
  - label: seen
    memory: {}
pipeline:
  processors:
    - dedupe:
        cache: seen
        key: '${! json("k") }'
""")
    df = p.to_pandas()
    assert len(df) == 2          # two distinct k values survive
    assert sorted(df["k"].tolist()) == [0, 1]


def test_file_scanner_decompress_content_semantics(tmp_path):
    """Two regressions pinned: (1) the file input must NOT let Ray
    auto-decompress by extension (.zst) — the decompress scanner owns
    the codec; (2) a mapping after a scanner input runs in content
    mode: content() is the scanner segment, not the row envelope."""
    from bento_ray import compression as cz
    from bento_ray.pipelines.builder import Pipeline

    payload = b"\n".join(f"rec {i}".encode() for i in range(10))
    f = tmp_path / "data.zst"
    f.write_bytes(cz.compress(payload, "zstd"))
    p = Pipeline.from_yaml(f"""
input:
  file:
    paths: ["{f}"]
    scanner:
      decompress:
        algorithm: zstd
        into:
          lines: {{}}
pipeline:
  processors:
    - mapping: 'root.body = content().string().uppercase()'
""")
    df = p.to_pandas()
    assert len(df) == 10
    import json

    docs = [json.loads(c) for c in df["content"]]
    assert docs[0] == {"body": "REC 0"}
    assert docs[9] == {"body": "REC 9"}


def test_stdin_input_with_scanner(monkeypatch):
    """input_stdin.go: piped stdin chopped into messages by the
    configured scanner (default lines)."""
    import io
    import json
    import sys
    import types

    from bento_ray.pipelines.builder import Pipeline

    monkeypatch.setattr(
        sys, "stdin",
        types.SimpleNamespace(buffer=io.BytesIO(b"aa\nbb\ncc")))
    p = Pipeline.from_yaml("""
input:
  stdin: {}
pipeline:
  processors:
    - mapping: 'root.up = content().string().uppercase()'
""")
    df = p.to_pandas()
    docs = [json.loads(c) for c in df["content"]]
    assert docs == [{"up": "AA"}, {"up": "BB"}, {"up": "CC"}]


def test_content_stage_binary_output_preserved():
    """A chain ending in compress emits bytes that are NOT valid
    UTF-8; the stage must emit a binary column, not a 'replace'
    decode that corrupts them irreversibly."""
    import pyarrow as pa

    from bento_ray import compression as cz
    from bento_ray.config.stage import ConfigProcessorStage

    stage = ConfigProcessorStage([{"compress": {"algorithm": "gzip"}}])
    out = stage(pa.table({"content": ["hello world"]}))
    assert pa.types.is_binary(out.schema.field("content").type)
    blob = out.column("content").to_pylist()[0]
    assert cz.decompress(blob, "gzip") == b"hello world"

    # pure-text chains keep the string column
    stage2 = ConfigProcessorStage(
        [{"mapping": "root = content().uppercase()"}])
    out2 = stage2(pa.table({"content": ["abc"]}))
    assert pa.types.is_string(out2.schema.field("content").type)
    assert out2.column("content").to_pylist() == ["ABC"]


def test_yaml_test_mock_preserves_label(tmp_path):
    """A label-replacing mock must keep the label so
    target_processors: <label> still resolves (it was dropped)."""
    import yaml

    from bento_ray.config import run_config_tests

    cfg = {
        "pipeline": {"processors": [
            {"label": "get_foo",
             "mapping": 'root = "real"'},
        ]},
        "tests": [{
            "name": "mocked",
            "target_processors": "get_foo",
            "mocks": {"get_foo": {"mapping": 'root = "mocked"'}},
            "input_batch": [{"content": "x"}],
            "output_batches": [[{"content_equals": "mocked"}]],
        }],
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    results = run_config_tests(str(p))
    assert results and all(r["ok"] for r in results), results
