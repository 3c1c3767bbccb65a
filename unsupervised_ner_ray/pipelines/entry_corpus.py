"""Interleaved corpus derived deterministically from a testdata sf dir.

The driver's testdata ``documents`` table (doc_id:int64, text, lang, source)
is flat text; the engine's mandated input shape is the interleaved
text+media spans table.  This adapter reads the sf documents parquet and
derives an interleaved corpus from it: each testdata row becomes one doc with
its (unmarked) text as span 0, a deterministic marked sentence from the
synthetic pool as span 1, and a media span every third doc — so NER queries
and ``entry()`` genuinely load the sf parquet while exercising the full
input_hint shape.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..corpus import SENTENCE_POOL
from ..sources.io import read_sf

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.large_string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)


def interleave_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id,text) batch -> interleaved docs batch (vectorizable
    map_batches body; deterministic per doc_id)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_ids, out_spans = [], []
    pool_n = len(SENTENCE_POOL)
    for doc_id, text in zip(doc_ids, texts):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        spans = [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
        offset = len(text.split())
        spans.append(
            {
                "kind": "text",
                "text": SENTENCE_POOL[h % pool_n],
                "media_ref": "",
                "offset": offset,
            }
        )
        if h % 3 == 0:
            ref = "media://" + hashlib.md5(str(doc_id).encode()).hexdigest()[:20]
            spans.append(
                {
                    # kind from the ref hash, independent of the h % 3 gate
                    "kind": ("image", "audio", "video")[int(ref[-1], 16) % 3],
                    "text": "",
                    "media_ref": ref,
                    "offset": offset + len(spans[1]["text"].split()),
                }
            )
        out_ids.append(f"doc-{doc_id:08d}")
        out_spans.append(spans)
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.string()),
            "spans": pa.array(out_spans, pa.list_(SPAN_TYPE)),
        }
    )


def corpus_from_sf(sf_dir: str, limit: int | None = None):
    """Read sf documents parquet -> interleaved docs Dataset (lazy)."""
    ds = read_sf(sf_dir, "documents", columns=["doc_id", "text"])
    if limit:
        ds = ds.limit(limit)
    return ds.map_batches(interleave_batch, batch_format="pyarrow")


def plain_corpus_from_sf(sf_dir: str, limit: int | None = None):
    """Plain-text-only corpus: one UNMARKED text span per doc — no pool
    sentences, no media spans.  This is the reference's ``sample_test.txt``
    use case (/root/reference/main_NER.py:225-230): raw prose in, so span
    detection must go through the POS fallback rather than explicit
    ``entity__`` markers."""

    def _plain(batch: pa.Table) -> pa.Table:
        ids = [f"plain-{d:08d}" for d in batch.column("doc_id").to_pylist()]
        spans = [
            [{"kind": "text", "text": t, "media_ref": "", "offset": 0}]
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "spans": pa.array(spans, pa.list_(SPAN_TYPE)),
            }
        )

    ds = read_sf(sf_dir, "documents", columns=["doc_id", "text"])
    if limit:
        ds = ds.limit(limit)
    return ds.map_batches(_plain, batch_format="pyarrow")
