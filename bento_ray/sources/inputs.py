"""Sources — the reference's input components re-expressed as Dataset
constructors (SURVEY.md §2.1).

| reference input | here |
|---|---|
| ``parquet`` (input_parquet.go:17) | ``read_parquet`` |
| ``file`` + lines/csv scanners (input_file.go:25) | ``read_lines`` / ``read_csv`` |
| ``generate`` (input_generate.go:33) | ``from_generate`` |
| ``sequence`` (input_sequence.go:35) | ``sequence`` (serial concat) |
| ``broker`` fan-in (input_broker.go:25) | ``broker`` (parallel union) |
| ``read_until`` (input_read_until.go:34) | ``read_until`` |
| ``inproc`` / ``resource`` | named registry (``register_stream`` / ``resource``) |

Scanner codecs (§2.10 — lines/csv/chunker/decompress/json_documents)
map onto the readers' own decoding plus ``flat_map`` for container
formats.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

import ray.data as rd


def _strip_meta(t: pa.Table) -> pa.Table:
    # file-level pandas metadata breaks Ray's hash-based schema dedupe
    # at every concat (see pipelines/queries._strip_meta)
    return t.replace_schema_metadata(None)


def _clean_schema(paths, columns):
    """Footer schema of the first file with ALL metadata stripped
    (projected to ``columns`` when given). The driver's parquet carries
    pandas metadata whose nested dicts make pyarrow.Schema unhashable,
    which defeats Ray's hash-based schema dedupe at every unify (the
    'Failed to hash the schemas' warning) — passing a clean schema to
    read_parquet kills that at the source. Footer-only read: cheap at
    any scale."""
    import os

    import pyarrow.parquet as pq

    path = paths[0] if isinstance(paths, (list, tuple)) else paths
    if os.path.isdir(path):
        names = [n for n in sorted(os.listdir(path))
                 if n.endswith(".parquet")]
        if not names:
            return None
        path = os.path.join(path, names[0])
    sch = pq.read_schema(path).remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def read_parquet(paths, columns=None, **kw):
    """Primary source. Always pass ``columns`` — reading all columns for
    a 2-column transform wastes the scan at scale."""
    if "schema" not in kw:
        try:
            sch = _clean_schema(paths, columns)
        except Exception:
            sch = None
        if sch is not None:
            return rd.read_parquet(paths, columns=columns, schema=sch,
                                   **kw)
    ds = rd.read_parquet(paths, columns=columns, **kw)
    return ds.map_batches(_strip_meta, batch_format="pyarrow",
                          batch_size=None)


def read_csv(paths, **kw):
    return rd.read_csv(paths, **kw)


def read_json(paths, **kw):
    return rd.read_json(paths, **kw)


def read_lines(paths, **kw):
    """file input + lines scanner: one row per line, column ``text``."""
    return rd.read_text(paths, **kw)


def from_generate(fn: Callable[[pa.Table], pa.Table], count: int,
                  batch_size: int = 1000, num_blocks: int | None = None):
    """The ``generate`` input: synthesize ``count`` rows by mapping a
    batch fn over row ids (column ``id``) — the deterministic fixture
    generator. ``interval`` pacing is meaningless in a batch DAG and is
    dropped."""
    ds = rd.range(count, override_num_blocks=num_blocks)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def sequence(*datasets):
    """Chain child inputs serially (input_sequence.go): in a bounded DAG
    this is a union; block order preserves argument order."""
    if not datasets:
        raise ValueError("sequence needs at least one dataset")
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


#: ``broker`` fan-in of N child inputs — in a pull-based DAG, union is
#: both the serial and parallel merge (the executor interleaves blocks).
broker = sequence


def read_until(ds, check: Callable[[pa.Table], bool], max_batches: int = 10_000,
               batch_size: int = 1024):
    """Consume the child input until ``check(batch)`` returns True (the
    triggering batch is included), mirroring input_read_until.go:34.
    Inherently sequential — the driver pulls batches in order; use only
    for bounded control flows, not hot paths."""
    out = []
    for i, batch in enumerate(ds.iter_batches(batch_format="pyarrow",
                                              batch_size=batch_size)):
        out.append(batch)
        if check(batch) or i + 1 >= max_batches:
            break
    if not out:
        return rd.from_items([])
    return rd.from_arrow(pa.concat_tables(out, promote_options="default"))


_REGISTRY: dict[str, object] = {}


def register_stream(name: str, ds) -> None:
    """``inproc`` / named resources: register a Dataset under a label."""
    _REGISTRY[name] = ds


def resource(name: str):
    return _REGISTRY[name]


def subprocess_input(name: str, args: list[str] | None = None,
                     codec: str = "lines", restart_on_exit: bool = False,
                     max_messages: int = 1_000_000,
                     max_restarts: int = 3):
    """``subprocess`` input (input_subprocess.go:17): execute a command
    and consume its stdout as messages via the ``lines`` codec; when
    the process exits the input closes gracefully, or re-executes it
    when ``restart_on_exit`` (bounded here — a batch DAG needs a finite
    input). Single-process by nature (like the reference), so the read
    happens on the driver and fans out as a Dataset; ``max_messages``
    bounds runaway children."""
    import subprocess as _sp

    if codec != "lines":
        raise ValueError(f"unsupported subprocess input codec: {codec}")
    rows: list[bytes] = []
    runs = 1 + (max_restarts if restart_on_exit else 0)
    for _ in range(runs):
        proc = _sp.Popen([name, *[str(a) for a in (args or [])]],
                         stdout=_sp.PIPE, stderr=_sp.DEVNULL)
        try:
            for line in proc.stdout:
                rows.append(line.rstrip(b"\r\n"))
                if len(rows) >= max_messages:
                    proc.kill()
                    break
        finally:
            proc.wait()
        if len(rows) >= max_messages:
            break
    return rd.from_arrow(pa.table({
        "content": pa.array(rows, pa.binary())}))
