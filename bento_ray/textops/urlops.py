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
from ray.data.aggregate import Sum

__all__ = [
    "parse_urls",
    "domain_stats",
    "top_domains",
    "filter_domains",
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
    nlab = parts.str.len().fillna(0).astype(int)
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
    return (t.append_column("scheme", pc.utf8_lower(scheme))
             .append_column("host", pc.utf8_lower(host))
             .append_column("path", path)
             .append_column("domain", pa.array(dom, pa.string())))


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
    uniq = (dedupe_exact(pairs, ["urlh"], keep="first",
                         order_cols=["domain"])
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
