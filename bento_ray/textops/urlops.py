"""URL / domain operations for webtext corpora.

Every large-scale web pipeline groups, filters and deduplicates by
domain (crawl politeness, per-domain quotas, blocklists, Zipfian-skew
analysis). These ops run over the north-rule ``pages`` table's ``url``
column but work on any string URL column.

Ray-Data-first shapes:

- URL parsing is ONE RE2 ``pc.extract_regex`` kernel per batch (no
  per-row Python); registrable-domain reduction is vectorized pandas
  string ops over the host column.
- Per-domain aggregation is combiner-shaped: per-batch Arrow
  hash-aggregates bound the shuffle to |domains| rows per block.
  Domains are Zipfian — the partial pass is exactly the salting-free
  mitigation: the hot domain contributes ONE row per block to the
  exchange, never its raw pages.
- Blocklists broadcast: the deny/allow set ships once per actor via
  ``ray.put`` (use a shuffle join instead if a blocklist ever outgrows
  worker memory — cosmic-scale blocklists are rare; PhishTank-scale
  lists are megabytes).

Reference behavior anchor: the reference engine's URL work lives in
Bloblang's ``parse_url`` method family
(`/root/reference/internal/bloblang/query/methods_url.go` in spirit);
here they are batch-vectorized Dataset stages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Min, Sum

__all__ = [
    "parse_urls",
    "domain_stats",
    "top_domains",
    "filter_domains",
    "canonicalize_urls",
    "url_dedup",
    "extract_links",
]

_URL_RE = (r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://"
           r"(?P<host>[^/?#]*)(?P<path>[^?#]*)")

# public-suffix-lite: common second-level registry suffixes. A real
# deployment loads the full Mozilla PSL (public data) — the reduction
# below is structured so swapping the set is the only change.
_TWO_LEVEL_SUFFIXES = frozenset({
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "com.tr",
    "com.ar", "co.za", "com.sg", "com.hk", "co.nz",
})


def _registrable(hosts: pd.Series) -> pd.Series:
    """Vectorized host → registrable domain: strip port and leading
    'www.', keep the last two labels (three when the 2-label tail is a
    known registry suffix). IPs and single-label hosts pass through."""
    h = hosts.str.lower().str.split(":").str[0].str.replace(
        r"^www\.", "", regex=True)
    parts = h.str.split(".")
    # to_numeric: the length series is object-dtype with pd.NA for
    # unparseable hosts — a direct astype(float) chokes on NAType and
    # fillna-on-object trips the pandas silent-downcasting warning
    nlab = pd.to_numeric(parts.str.len(),
                         errors="coerce").fillna(0).astype(int)
    last2 = np.where(nlab >= 2,
                     parts.str[-2].fillna("") + "." + parts.str[-1].fillna(""),
                     h.fillna(""))
    is_ip = h.str.fullmatch(r"[0-9.]+").eq(True).to_numpy()
    suffixed = pd.Series(last2, index=h.index).isin(
        _TWO_LEVEL_SUFFIXES).to_numpy() & (nlab >= 3).to_numpy()
    last3 = np.where(nlab >= 3,
                     parts.str[-3].fillna("") + "." + last2, last2)
    out = np.where(is_ip, h.fillna(""),
                   np.where(suffixed, last3, last2))
    return pd.Series(out, index=hosts.index, dtype=object)


def _parse_batch(t: pa.Table, col: str) -> pa.Table:
    urls = t.column(col)
    m = pc.extract_regex(urls, _URL_RE)
    scheme = pc.struct_field(m, "scheme")
    host = pc.struct_field(m, "host")
    path = pc.struct_field(m, "path")
    dom = _registrable(host.to_pandas().astype("string").astype(object))
    dom_arr = pa.array(dom, pa.string())
    # unparseable URLs get NULL domain like scheme/host/path — the
    # _registrable fillna('') otherwise invents a phantom '' domain
    # that domain_stats would aggregate junk rows under
    if host.null_count:
        dom_arr = pc.if_else(pc.is_valid(host), dom_arr,
                             pa.scalar(None, pa.string()))
    return (t.append_column("scheme", pc.utf8_lower(scheme))
             .append_column("host", pc.utf8_lower(host))
             .append_column("path", path)
             .append_column("domain", dom_arr))


def parse_urls(ds, col: str = "url"):
    """Append (scheme, host, path, domain) columns — one RE2 kernel
    per batch; unparseable URLs get nulls."""
    return ds.map_batches(lambda t: _parse_batch(t, col),
                          batch_format="pyarrow")


def domain_stats(ds, col: str = "url", key: str = "domain"):
    """Per-domain corpus stats: (domain, pages, unique_urls).
    ``key="host"`` groups by full host instead of registrable domain
    (useful when a corpus lives under one registrable domain).

    pages: combiner partial counts → one |domains|-row shuffle.
    unique_urls: exact, via per-batch distinct (domain, url-hash)
    pairs → global exact dedupe on the hash (one bounded shuffle:
    ≤ 1 row per distinct url per block) → per-domain count."""
    from bento_ray.stages.dedupe import dedupe_exact
    from bento_ray.util import stable_hash

    parsed = ds.map_batches(lambda t: _parse_batch(t, col),
                            batch_format="pyarrow")

    def _pairs(t: pa.Table) -> pa.Table:
        urlh = stable_hash(t.column(col)).astype(np.int64)
        tt = pa.table({"domain": t.column(key),
                       "urlh": pa.array(urlh, pa.int64())})
        # per-batch distinct pairs: bounds the dedupe shuffle input
        return tt.group_by(["domain", "urlh"]).aggregate([])

    pairs = parsed.map_batches(_pairs, batch_format="pyarrow")
    # dedupe on the (domain, urlh) PAIR: keying on urlh alone would
    # merge cross-domain 64-bit hash collisions and undercount the
    # colliding domain's unique_urls
    uniq = (dedupe_exact(pairs, ["domain", "urlh"], keep="first")
            .groupby("domain").count()
            .map_batches(lambda t: t.rename_columns(
                ["domain", "unique_urls"]), batch_format="pyarrow"))

    def _page_partial(t: pa.Table) -> pa.Table:
        agg = (pa.table({"domain": t.column(key)})
               .group_by("domain").aggregate([("domain", "count")]))
        return pa.table({
            "domain": agg.column("domain"),
            "p": agg.column("domain_count").cast(pa.int64()),
        })

    pages = (parsed.map_batches(_page_partial, batch_format="pyarrow")
             .groupby("domain").aggregate(Sum("p", alias_name="pages")))

    from bento_ray.stages.join import shuffle_join

    out = shuffle_join(pages.materialize(), uniq.materialize(),
                       on="domain", how="left", force_fallback=True)

    def _final(t: pa.Table) -> pa.Table:
        return pa.table({
            "domain": t.column("domain"),
            "pages": t.column("pages").cast(pa.int64()),
            "unique_urls": t.column("unique_urls").fill_null(0)
                            .cast(pa.int64()),
        })

    return out.map_batches(_final, batch_format="pyarrow")


def top_domains(ds, k: int = 20, col: str = "url",
                key: str = "domain"):
    """Top-k domains by page count (ties → lexicographic)."""
    return domain_stats(ds, col, key=key).sort(
        ["pages", "domain"], descending=[True, False]).limit(k)


def extract_links(ds, html_col: str = "html", src_col: str = "url"):
    """Outlink extraction — the crawl-graph edge pass: one row per
    ``href="..."`` occurrence as (src, link). Fully vectorized: one
    Arrow ``split_pattern`` on the attribute marker per batch, a
    boolean mask drops each doc's pre-href prefix, and one RE2 kernel
    trims each fragment at the closing quote — no per-row Python over
    HTML. Feed through :func:`parse_urls`/``domain_stats`` for a
    domain graph, or ``textops.graph.pagerank`` for link authority."""

    def _f(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t.column(html_col), 'href="')
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.values
        offsets = np.asarray(lists.offsets)
        counts = np.diff(offsets)
        # the first fragment of every doc precedes its first href
        keep = np.ones(len(flat), bool)
        keep[offsets[:-1][counts > 0]] = False
        row_ids = np.repeat(np.arange(len(counts)), counts)[keep]
        frags = flat.filter(pa.array(keep))
        m = pc.extract_regex(frags, r'^(?P<l>[^"]*)')
        # html often arrives binary (parquet BYTE_ARRAY) — links are text
        links = pc.struct_field(m, "l").cast(pa.string())
        src = t.column(src_col).take(pa.array(row_ids, pa.int64()))
        return pa.table({"src": src, "link": links})

    return ds.map_batches(_f, batch_format="pyarrow")


_FULL_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)"
                r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$")

# ports implied by the scheme — stripped during canonicalization
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def _canonical_query(query: pa.Array) -> pa.Array:
    """Normalize query strings: split on '&', drop empty and ``utm_*``
    tracking params, byte-sort the remainder (UTF-8 byte order ==
    codepoint order), re-join. Fully Arrow-native: split →
    two-key sort_indices → take → ``pc.binary_join`` — no per-row
    Python and no object-dtype round-trips (the former numpy
    ``astype(str)`` lexsort copied every param into 4-byte-per-char
    unicode buffers, the hottest memory-traffic pass of the chain)."""
    qs = pc.fill_null(query, "")
    lists = pc.split_pattern(qs, "&")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.values
    counts = np.diff(np.asarray(lists.offsets))
    row_ids = np.repeat(np.arange(len(counts)), counts)
    # drop empty params and utm_* trackers — Arrow kernels, no Python
    keep = pc.and_(pc.greater(pc.utf8_length(flat), 0),
                   pc.invert(pc.starts_with(flat, "utm_"))).to_numpy(
        zero_copy_only=False)
    keep &= ~np.asarray(pc.is_null(flat))
    sel = np.flatnonzero(keep)
    vals_k = pc.take(flat, pa.array(sel, pa.int64()))
    ids_k = row_ids[sel]
    order = pc.sort_indices(
        pa.table({"id": ids_k, "v": vals_k}),
        sort_keys=[("id", "ascending"), ("v", "ascending")])
    vals_s = pc.take(vals_k, order)
    ids_s = ids_k[np.asarray(order)]
    new_counts = np.bincount(ids_s, minlength=len(counts))
    new_offsets = np.concatenate([[0], np.cumsum(new_counts)])
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()),
                                 vals_s.combine_chunks()
                                 if isinstance(vals_s, pa.ChunkedArray)
                                 else vals_s),
        "&")
    return joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) \
        else joined


def canonicalize_batch(urls) -> pa.Array:
    """Canonical URL form (one RE2 parse + vectorized normalization):
    lowercase scheme and host, strip leading ``www.`` and the scheme's
    default port, drop the fragment, drop ``utm_*`` params, byte-sort
    the remaining query params, strip a lone trailing slash from
    non-root paths (empty path → ``/``). Unparseable rows → null.

    Every pass is an Arrow kernel over contiguous string buffers —
    the former pandas object-dtype chain moved ~2.5 KB/row of heap
    traffic and capped multi-core scaling on wide hosts at the memory
    bus, not the CPUs."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    m = pc.extract_regex(urls, _FULL_URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    host = pc.utf8_lower(pc.struct_field(m, "host"))
    path = pc.struct_field(m, "path")
    q = _canonical_query(pc.struct_field(m, "query"))

    for sch, port in _DEFAULT_PORTS.items():
        stripped = pc.replace_substring_regex(host, port + "$", "")
        host = pc.if_else(pc.equal(scheme, sch), stripped, host)
    host = pc.replace_substring_regex(host, r"^www\.", "")
    path = pc.if_else(pc.equal(path, ""), "/", path)
    path = pc.replace_substring_regex(path, r"^(.+)/$", r"\1")

    qmark = pc.if_else(pc.equal(q, ""), "", "?")
    return pc.binary_join_element_wise(
        scheme, "://", host, path, qmark, pc.fill_null(q, ""), "")


def canonicalize_urls(ds, col: str = "url", out: str = "canonical_url"):
    """Append a canonical-URL column (see :func:`canonicalize_batch`).
    The canonical form is THE dedup key for web corpora — the same page
    crawled as ``HTTP://WWW.X.COM:80/a/?utm_source=y&b=1#top`` and
    ``http://x.com/a?b=1`` collapses to one key."""
    return ds.map_batches(
        lambda t: t.append_column(out, canonicalize_batch(t.column(col))),
        batch_format="pyarrow")


def url_dedup(ds, col: str = "url", id_col: str = "doc_id"):
    """Canonical-URL exact dedup summary: one row per canonical URL
    with ``n_pages`` (how many raw rows collapsed into it) and
    ``keeper_doc_id`` (the smallest id — the row a dedup pass keeps).

    Combiner-shaped: per-batch (canonical → count, min-id) partials
    bound the shuffle to one row per distinct canonical per block —
    at crawl scale the hot URL contributes one partial row per block,
    never its raw pages."""
    withc = canonicalize_urls(ds, col)

    def _partial(t: pa.Table) -> pa.Table:
        agg = (pa.table({"canonical_url": t.column("canonical_url"),
                         "id": t.column(id_col)})
               .group_by("canonical_url")
               .aggregate([("id", "count"), ("id", "min")]))
        return pa.table({
            "canonical_url": agg.column("canonical_url"),
            "n": agg.column("id_count").cast(pa.int64()),
            "mid": agg.column("id_min"),
        })

    return (withc.map_batches(_partial, batch_format="pyarrow")
            .groupby("canonical_url")
            .aggregate(Sum("n", alias_name="n_pages"),
                       Min("mid", alias_name="keeper_doc_id")))


def filter_domains(ds, domains, mode: str = "deny", col: str = "url"):
    """Keep (mode='allow') or drop (mode='deny') rows whose registrable
    domain is in ``domains``. The set is broadcast once via ray.put and
    membership tested with one vectorized ``pc.is_in`` per batch."""
    if mode not in ("deny", "allow"):
        raise ValueError(f"mode must be deny/allow, got {mode!r}")
    dom_ref = ray.put(pa.array(sorted(set(domains)), pa.string()))
    deny = mode == "deny"

    def _f(t: pa.Table) -> pa.Table:
        value_set = ray.get(dom_ref)
        parsed = _parse_batch(t, col)
        hit = pc.is_in(parsed.column("domain"), value_set=value_set)
        keep = pc.invert(pc.fill_null(hit, False)) if deny \
            else pc.fill_null(hit, False)
        return t.filter(keep)

    return ds.map_batches(_f, batch_format="pyarrow")
