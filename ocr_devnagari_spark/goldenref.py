"""Golden oracle: single-threaded pure-Python reference extraction.

Produces ``golden(url, text, backend_used, success)`` for a corpus directory
by looping over pages one at a time on one thread — the analog of the
reference's sequential legacy path (``processor.py:187-332``, one page in
flight). The Spark pipeline's output must match this **byte-for-byte per
url** (FIXTURES.md F2); partitioning-invariance tests then establish that
the distributed plan cannot diverge from it.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .extract_core import extract_document

GOLDEN_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("text", pa.string()),
    ("backend_used", pa.string()),
    ("success", pa.bool_()),
])


def golden_extract_corpus(corpus_dir: str, out_path: str | None = None) -> str:
    """Run the golden extractor over ``corpus_dir/pages.parquet``.

    Single-threaded by design — this is the spec, not the engine.
    Returns the path of the written ``golden.parquet``.
    """
    if out_path is None:
        out_path = os.path.join(corpus_dir, "golden.parquet")
    marker = out_path + ".done"
    if os.path.exists(marker):
        return out_path
    import pyarrow.dataset as ds
    src = ds.dataset(os.path.join(corpus_dir, "pages.parquet"))
    writer = pq.ParquetWriter(out_path, GOLDEN_SCHEMA, compression="zstd")
    for batch in src.to_batches(batch_size=1024, columns=["url", "html"]):
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        rows = []
        for url, payload in zip(urls, htmls):
            r = extract_document(url, payload)
            rows.append({"url": r["url"], "text": r["text"],
                         "backend_used": r["backend_used"],
                         "success": r["success"]})
        writer.write_table(pa.Table.from_pylist(rows, schema=GOLDEN_SCHEMA))
    writer.close()
    with open(marker, "w") as f:
        f.write("ok")
    return out_path
