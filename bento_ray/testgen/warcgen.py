"""Deterministic WARC corpus synthesized from a documents.parquet table.

Closes the Common-Crawl ingestion story end-to-end for the oracle gate:
the q_warc_curation query reads documents *only through* the .warc.gz
container (synth → gzip member → distributed scan → ISO 28500 record
walk → typed parse), so any corruption in the WARC writer/scanner/
reader chain breaks the DuckDB value-hash against the same parquet.

Layout: ``shards`` gzip members, each holding one ``warcinfo`` record
(filtered out by warc_type downstream — its presence is part of the
test) followed by the shard's documents as ``response`` records with
``WARC-Target-URI: https://corpus.example/<lang>/<doc_id>`` and the
UTF-8 text as payload. Sharding is ``doc_id % shards`` and records are
doc_id-sorted within a shard — fully deterministic, no RNG.
"""

from __future__ import annotations

import gzip
import os


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers)
    head += f"Content-Length: {len(payload)}\r\n\r\n"
    return head.encode() + payload + b"\r\n\r\n"


def ensure_warc_corpus(sf_dir: str, shards: int = 8,
                       cache_root: str = "/tmp/bento_warc") -> list[str]:
    """Synthesize (once, cached by the source parquet's identity) a
    .warc.gz corpus from ``{sf_dir}/documents.parquet`` and return the
    sorted member paths."""
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = f"{os.path.basename(os.path.normpath(sf_dir))}-" \
          f"{st.st_size}-{int(st.st_mtime)}-s{shards}"
    out_dir = os.path.join(cache_root, key)
    done = os.path.join(out_dir, "_DONE")
    paths = [os.path.join(out_dir, f"shard-{i:03d}.warc.gz")
             for i in range(shards)]
    if os.path.exists(done):
        return paths

    t = pq.read_table(src, columns=["doc_id", "text", "lang"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    rows = sorted(zip(ids, texts, langs))
    os.makedirs(out_dir, exist_ok=True)
    for s in range(shards):
        buf = _record(
            [("WARC-Type", "warcinfo"),
             ("WARC-Date", "2026-01-01T00:00:00Z")],
            f"software: bento_ray warcgen shard {s}\r\n".encode())
        parts = [buf]
        for doc_id, text, lang in rows:
            if doc_id % shards != s:
                continue
            parts.append(_record(
                [("WARC-Type", "response"),
                 ("WARC-Target-URI",
                  f"https://corpus.example/{lang}/{doc_id}"),
                 ("WARC-Date", "2026-01-01T00:00:00Z")],
                (text or "").encode("utf-8")))
        tmp = paths[s] + ".tmp"
        with gzip.open(tmp, "wb", compresslevel=1) as fh:
            fh.write(b"".join(parts))
        os.replace(tmp, paths[s])
    with open(done, "w") as fh:
        fh.write("ok")
    return paths
