"""Composition / control-flow operators: switch, group_by, branch,
try/catch — expressed as masked vectorized transforms that preserve the
reference's ordering guarantees.

Error routing: instead of the reference's per-part error flag
(message/part.go:69-78) we carry a nullable ``err`` string column;
``try``/``catch`` are masked applications over it.
"""

from __future__ import annotations

import json
from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bento_ray.util import to_table

Predicate = Callable[[pa.Table], pa.Array]
BatchFn = Callable[[pa.Table], pa.Table]

ERR_COL = "err"


def _mask_of(pred: Predicate | None, t: pa.Table) -> np.ndarray:
    if pred is None:
        return np.ones(len(t), dtype=bool)
    m = pred(t)
    if isinstance(m, (pa.Array, pa.ChunkedArray)):
        m = m.to_numpy(zero_copy_only=False)
    return np.asarray(m, dtype=bool)


def switch_table(t: pa.Table, cases: Sequence[tuple[Predicate | None, BatchFn | None]],
                 fallthrough: Sequence[bool] | None = None) -> pa.Table:
    """Bento ``switch`` (processor_switch.go:160-225): each row is
    tested against cases in order; the first passing case's transform
    runs on the row subset. A case marked ``fallthrough`` carries its
    PROCESSED rows into the next case's transform unconditionally (the
    reference's carryOver — carried rows skip the next case's check).
    Non-matching rows pass through unchanged. Output is reassembled in
    ORIGINAL input order (the reference's SortGroup re-ordering).

    Constraint inherited from columnar reassembly: case transforms must
    be 1:1 per row (no row drops/additions inside a case — drop via a
    later filter on a marker column instead). Deviation from the
    reference: rows still carried over after the LAST case are emitted
    rather than silently dropped."""
    t = to_table(t)
    n = len(t)
    if fallthrough is None:
        fallthrough = [False] * len(cases)
    elif len(fallthrough) != len(cases):
        # zip() would silently truncate to the shorter list, skipping
        # trailing cases entirely
        raise ValueError(
            f"switch: fallthrough has {len(fallthrough)} entries for "
            f"{len(cases)} cases — they must match 1:1")
    remaining_idx = np.arange(n)
    remaining_tbl = t
    carry_idx = np.zeros(0, np.int64)
    carry_tbl: pa.Table | None = None
    pieces: list[tuple[np.ndarray, pa.Table]] = []
    for (pred, fn), ft in zip(cases, fallthrough):
        m = _mask_of(pred, remaining_tbl)
        passed_idx = remaining_idx[m]
        passed_tbl = remaining_tbl.filter(pa.array(m))
        if carry_tbl is not None and len(carry_tbl):
            passed_idx = np.concatenate([carry_idx, passed_idx])
            passed_tbl = pa.concat_tables([carry_tbl, passed_tbl],
                                          promote_options="default")
        remaining_idx = remaining_idx[~m]
        remaining_tbl = remaining_tbl.filter(pa.array(~m))
        carry_idx, carry_tbl = np.zeros(0, np.int64), None
        if len(passed_tbl) == 0:
            continue
        out = fn(passed_tbl) if fn is not None else passed_tbl
        if len(out) != len(passed_tbl):
            raise ValueError("switch case transforms must be 1:1 per row")
        if ft:
            carry_idx, carry_tbl = passed_idx, out
        else:
            pieces.append((passed_idx, out))
    if carry_tbl is not None and len(carry_tbl):
        pieces.append((carry_idx, carry_tbl))
    if len(remaining_tbl):
        pieces.append((remaining_idx, remaining_tbl))
    if not pieces:
        return t.slice(0, 0)
    all_idx = np.concatenate([p[0] for p in pieces])
    merged = pa.concat_tables([p[1] for p in pieces], promote_options="default")
    restore = np.argsort(all_idx, kind="stable")
    return merged.take(pa.array(restore))


def switch(ds, cases, fallthrough=None):
    """Dataset-level switch: one map_batches applying switch_table."""
    return ds.map_batches(
        lambda t: switch_table(t, cases, fallthrough), batch_format="pyarrow"
    )


def group_by_table(t: pa.Table, checks: Sequence[tuple[Predicate, BatchFn | None]],
                   groupless_fn: BatchFn | None = None) -> list[pa.Table]:
    """Bento ``group_by`` (processor_group_by.go:130): split a semantic
    batch into N groups by first-matching check (non-matching rows form
    a trailing "groupless" group), run per-group processors, emit one
    batch per group in declaration order."""
    t = to_table(t)
    active = np.ones(len(t), dtype=bool)
    out: list[pa.Table] = []
    for pred, fn in checks:
        m = _mask_of(pred, t) & active
        active &= ~m
        sub = t.filter(pa.array(m))
        if len(sub):
            out.append(fn(sub) if fn is not None else sub)
    if active.any():
        sub = t.filter(pa.array(active))
        out.append(groupless_fn(sub) if groupless_fn is not None else sub)
    return out


def group_by_value_table(t: pa.Table, key_col: str) -> list[tuple[str, pa.Table]]:
    """Bento ``group_by_value`` (processor_group_by_value.go:86): split a
    batch into per-key sub-batches, insertion-ordered by first
    occurrence of each key."""
    t = to_table(t)
    keys = t.column(key_col).to_pylist()
    seen: dict = {}
    for k in keys:
        if k not in seen:
            seen[k] = None
    out = []
    karr = t.column(key_col)
    for k in seen:
        if k is None:
            # pc.equal against a null scalar yields an all-null mask
            # and filter() drops null entries — the null-key rows
            # would vanish from every group
            mask = pc.is_null(karr)
        else:
            mask = pc.equal(karr, pa.scalar(k, karr.type))
        out.append((k, t.filter(mask)))
    return out


def branch(ds, request_map: BatchFn, child: BatchFn, result_map):
    """Bento ``branch`` (processor_branch.go:284): project request
    columns → child transform → merge result columns back onto the
    original rows by position. ``result_map(original, child_out)``
    returns the merged table; child must be 1:1 per row."""

    def _f(t: pa.Table) -> pa.Table:
        req = request_map(t)
        res = child(req)
        if len(res) != len(t):
            raise ValueError("branch child must be 1:1 per row")
        return result_map(t, res)

    return ds.map_batches(_f, batch_format="pyarrow")


def _workflow_layers(branches):
    done: set[str] = set()
    remaining = dict(branches)
    layers: list[list[str]] = []
    while remaining:
        layer = [n for n, (deps, _) in remaining.items()
                 if all(d in done for d in deps)]
        if not layer:
            raise ValueError("workflow dependency cycle")
        layers.append(layer)
        done.update(layer)
        for n in layer:
            del remaining[n]
    return layers


def workflow(ds, branches: dict[str, tuple[Sequence[str], BatchFn]],
             meta_col: str | None = None):
    """Bento ``workflow`` (processor_workflow.go:47-115): DAG of named
    branches executed in topological layers. ``branches`` maps name →
    (dependencies, batch fn); each fn sees the cumulative table.

    ``meta_col`` enables the reference's per-message skip conditions +
    result tracking (processor_workflow.go:404-449, 459-560): the named
    JSON column may carry ``{"apply": [...]}`` (whitelist — all other
    stages skip), ``{"succeeded": [...]}`` / ``{"skipped": [...]}``
    (stages completed in a previous run skip), and after execution the
    column holds ``{"succeeded": [...], "skipped": [...],
    "failed": {stage: error}}`` per row. Without ``meta_col`` the hot
    vectorized path runs every branch on every row."""
    layers = _workflow_layers(branches)

    if meta_col is None:
        def _apply(names):
            def _f(t: pa.Table) -> pa.Table:
                for n in names:
                    t = branches[n][1](t)
                return t
            return _f

        for names in layers:
            ds = ds.map_batches(_apply(names), batch_format="pyarrow")
        return ds

    all_stages = set(branches)

    def _tracked(t: pa.Table) -> pa.Table:
        import numpy as np

        n = len(t)
        if meta_col in t.column_names:
            metas = [json.loads(v) if v else {}
                     for v in t.column(meta_col).to_pylist()]
            t = t.drop_columns([meta_col])
        else:
            metas = [{} for _ in range(n)]
        skip: list[set] = []
        for mrec in metas:
            s: set = set()
            ap = mrec.get("apply") or []
            if ap:
                s = all_stages - {x for x in ap if x in all_stages}
            s |= {x for x in (mrec.get("succeeded") or [])
                  if x in all_stages}
            s |= {x for x in (mrec.get("skipped") or [])
                  if x in all_stages}
            skip.append(s)
        succeeded = [set() for _ in range(n)]
        skipped = [set(s) for s in skip]
        failed: list[dict] = [{} for _ in range(n)]

        for names in layers:
            for name in names:
                fn = branches[name][1]
                mask = np.array([name not in skip[i] for i in range(n)])
                if mask.all():
                    try:
                        t = fn(t)
                        for i in range(n):
                            succeeded[i].add(name)
                    except Exception as e:  # noqa: BLE001
                        for i in range(n):
                            failed[i][name] = str(e)
                    continue
                if not mask.any():
                    continue
                sub = t.filter(pa.array(mask))
                try:
                    res = fn(sub)
                except Exception as e:  # noqa: BLE001
                    for i in np.flatnonzero(mask):
                        failed[i][name] = str(e)
                    continue
                # merge: new columns gain nulls on skipped rows; existing
                # columns take the branch's values on included rows
                pos = np.flatnonzero(mask)
                df = t.to_pandas()
                rdf = res.to_pandas()
                for c in rdf.columns:
                    if c not in df.columns:
                        df[c] = None
                    df.loc[df.index[pos], c] = rdf[c].to_numpy()
                t = pa.Table.from_pandas(
                    df, preserve_index=False).replace_schema_metadata(None)
                for i in pos:
                    succeeded[i].add(name)

        recs = []
        for i in range(n):
            rec: dict = {}
            if succeeded[i]:
                rec["succeeded"] = sorted(succeeded[i])
            if skipped[i]:
                rec["skipped"] = sorted(skipped[i])
            if failed[i]:
                rec["failed"] = failed[i]
            recs.append(json.dumps(rec, sort_keys=True))
        return t.append_column(meta_col, pa.array(recs, pa.string()))

    return ds.map_batches(_tracked, batch_format="pyarrow")


def _ensure_err(t: pa.Table) -> pa.Table:
    if ERR_COL not in t.column_names:
        return t.append_column(ERR_COL, pa.nulls(len(t), pa.string()))
    return t


def try_stage(ds, fn: BatchFn):
    """Bento ``try`` (processor_try.go): apply ``fn`` only to rows not
    already errored; rows where fn raises keep their original values and
    gain an ``err`` message (per-row error isolation is achieved by
    retrying the failing batch row-by-row — the vectorized path stays
    hot, the degraded path only runs on failure)."""

    def _f(t: pa.Table) -> pa.Table:
        t = _ensure_err(t)
        ok = pc.is_null(t.column(ERR_COL)).to_numpy(zero_copy_only=False)
        if not ok.any():
            return t
        idx = np.flatnonzero(ok)
        sub = t.take(pa.array(idx))
        try:
            out = fn(sub)
            if len(out) != len(sub):
                raise ValueError("try child must be 1:1 per row")
        except Exception:
            # degraded path: per-row application to isolate failures
            rows = []
            for i in range(len(sub)):
                one = sub.slice(i, 1)
                try:
                    rows.append(fn(one))
                except Exception as e:  # noqa: BLE001 — error routed to column
                    failed = one.set_column(
                        one.column_names.index(ERR_COL), ERR_COL,
                        pa.array([str(e)], pa.string()))
                    rows.append(failed)
            out = pa.concat_tables(rows, promote_options="default")
        merged = pa.concat_tables(
            [out, t.filter(pa.array(~ok))], promote_options="default")
        all_idx = np.concatenate([idx, np.flatnonzero(~ok)])
        return merged.take(pa.array(np.argsort(all_idx, kind="stable")))

    return ds.map_batches(_f, batch_format="pyarrow")


def catch_errors(ds, fn: BatchFn | None = None):
    """Bento ``catch`` (processor_catch.go): run ``fn`` only on errored
    rows, then CLEAR their error flag."""

    def _f(t: pa.Table) -> pa.Table:
        t = _ensure_err(t)
        bad = pc.is_valid(t.column(ERR_COL)).to_numpy(zero_copy_only=False)
        if not bad.any():
            return t
        idx = np.flatnonzero(bad)
        sub = t.take(pa.array(idx))
        if fn is not None:
            sub = fn(sub)
        sub = sub.set_column(sub.column_names.index(ERR_COL), ERR_COL,
                             pa.nulls(len(sub), pa.string()))
        ok_idx = np.flatnonzero(~bad)
        merged = pa.concat_tables(
            [sub, t.take(pa.array(ok_idx))], promote_options="default")
        all_idx = np.concatenate([idx, ok_idx])
        return merged.take(pa.array(np.argsort(all_idx, kind="stable")))

    return ds.map_batches(_f, batch_format="pyarrow")
