"""Deterministic synthetic interleaved text+media document corpus.

Shape mandated by BASELINE.json ``input_hint``:

    doc_id: string
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>

Text-span sentences are built from (a) a small set of literal sentences taken
from the reference's own canned test corpora (batched_main_NER.py:837-876,
ensemble/aggregate_server_json.py:573-719, single_entity_test.txt) and (b)
templates filled from the synthetic vocabulary (assets._SEED_VOCAB), with
``:__entity__`` markers — the reference's "specific" tagging mode
(README.md:27, set_POS_based_on_entities common.py:66-79).  Media spans
(image/audio) carry opaque ``media://`` refs the NER core must pass through
untouched (per-row span-sequence invariant).

Everything is seeded — same (n_docs, seed) always yields identical bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# literal sentences from the reference test corpora (cited above)
_REFERENCE_SENTENCES = [
    "Mesothelioma:__entity__ is caused by exposure to asbestos:__entity__",
    "Her hypophysitis:__entity__ secondary to ipilimumab:__entity__ was well managed with supplemental:__entity__ hormones:__entity__",
    "Imatinib:__entity__ mesylate:__entity__ is a drug and is used to treat nsclc:__entity__",
    "Ajit:__entity__ rajasekharan is an engineer:__entity__ at nFerence:__entity__",
    "He felt New:__entity__ York:__entity__ has a chance to win this year's competition",
    "Lou:__entity__ Gehrig:__entity__ who works for XCorp:__entity__ and lives in New:__entity__ York:__entity__ suffers from Parkinson's:__entity__",
    "In humans mutations in Foxp2:__entity__ leads to verbal dyspraxia:__entity__",
    "Fyodor:__entity__ Mikhailovich:__entity__ Dostoevsky:__entity__ was treated for Parkinsons:__entity__",
    "A eGFR:__entity__ below 60:__entity__ indicates chronic:__entity__ kidney:__entity__ disease:__entity__",
    "The portfolio manager of the new cryptocurrency firm underwent a bone:__entity__ marrow:__entity__ biopsy:__entity__ for AML:__entity__",
    "Coronavirus:__entity__ disease is caused by a virus:__entity__ NOT by bacteria:__entity__",
    "Overexpression of EGFR:__entity__ occurs across a wide range of different cancers",
    "Elon:__entity__ Musk:__entity__ said Tesla:__entity__ will open a manufacturing plant in Europe:__entity__",
    "imatinib:__entity__ was used to treat Michael:__entity__ Jackson:__entity__",
    "He flew from New:__entity__ York:__entity__ to SFO",
    "they flew from Boston:__entity__ to Rio De Janiro and had a mocha",
    "Currently, there are no approved therapies available for CML:__entity__ patients who fail dasatinib:__entity__ or nilotinib:__entity__ in second line",
    # blank-context CI probe (harvest path; reference batched_main_NER.py:147-163)
    "imatinib mesylate is a treatment for nsclc :__entity__",
]

# templates filled from the vocabulary; {x:marked} renders "word:__entity__"
_TEMPLATES = [
    ("{d}:__entity__ is used to treat {dis}:__entity__", ["d", "dis"]),
    ("{p}:__entity__ works at {org}:__entity__ in {loc}:__entity__", ["p", "org", "loc"]),
    ("mutations in {g}:__entity__ can cause {dis}:__entity__", ["g", "dis"]),
    ("{dis}:__entity__ is treated with {d}:__entity__ at {org}:__entity__", ["dis", "d", "org"]),
    ("{p}:__entity__ flew from {loc}:__entity__ to {loc2}:__entity__", ["p", "loc", "loc2"]),
    ("{g}:__entity__ expression is elevated in {dis}:__entity__ patients", ["g", "dis"]),
    ("{d}:__entity__ inhibits {g}:__entity__ in the {body}:__entity__", ["d", "g", "body"]),
]

_SLOT_POOLS = {
    "d": ["imatinib", "ipilimumab", "dasatinib", "nilotinib", "sunitinib", "selegiline"],
    "dis": ["mesothelioma", "leukemia", "tonsillitis", "nsclc", "aml", "cml", "hypophysitis"],
    "g": ["egfr", "foxp2", "cftr", "cdk", "urokinase", "kinase"],
    "p": ["Ajit", "Fyodor", "Musk", "Elon", "Lou", "Gehrig"],
    "org": ["nFerence", "Pfizer", "XCorp", "Microbix", "Tesla"],
    "loc": ["Seattle", "Boston", "Beijing", "Miami", "Houston", "Alabama"],
    "loc2": ["California", "Cambridge", "Wuhan", "Italy", "Japan", "Europe"],
    "body": ["kidney", "lung", "heart", "marrow", "bone"],
}


def _sentence_pool() -> list[str]:
    pool = list(_REFERENCE_SENTENCES)
    rng = np.random.RandomState(7)
    for _ in range(120):
        tmpl, slots = _TEMPLATES[rng.randint(len(_TEMPLATES))]
        fills = {s: _SLOT_POOLS[s][rng.randint(len(_SLOT_POOLS[s]))] for s in slots}
        pool.append(tmpl.format(**fills))
    return pool


SENTENCE_POOL = _sentence_pool()


def make_documents(n_docs: int, seed: int = 42, media_every: int = 3) -> pa.Table:
    """Interleaved text+media documents table (Arrow)."""
    rng = np.random.RandomState(seed)
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    pool = SENTENCE_POOL
    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        n_spans = 1 + int(rng.randint(5))
        spans = []
        offset = 0
        for j in range(n_spans):
            if media_every and (i + j) % media_every == 2:
                ref = "media://" + hashlib.md5(f"{doc_id}/{j}".encode()).hexdigest()[:20]
                # kind from the ref hash — independent of the media_every
                # gate (a (i+j)%k selector would alias with the gate's
                # (i+j)%media_every and collapse to one kind)
                kind = ("image", "audio", "video")[int(ref[-1], 16) % 3]
                spans.append(
                    {"kind": kind, "text": "", "media_ref": ref, "offset": offset}
                )
                offset += 1
            else:
                text = pool[int(rng.randint(len(pool)))]
                spans.append(
                    {"kind": "text", "text": text, "media_ref": "", "offset": offset}
                )
                offset += len(text.split())
        doc_ids.append(doc_id)
        spans_col.append(spans)
    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.large_string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans_col, pa.list_(span_type)),
        }
    )


def write_corpus(
    path: str, n_docs: int, seed: int = 42, row_group_docs: int = 4096,
    n_files: int = 1,
) -> str:
    """Write the corpus as one parquet file (``path`` = file) or, with
    ``n_files>1``, a directory of part files — the multi-file layout the
    checkpointed pipeline shards by fragment."""
    import os

    import pyarrow.parquet as pq

    table = make_documents(n_docs, seed)
    if n_files <= 1:
        pq.write_table(table, path, row_group_size=row_group_docs)
        return path
    os.makedirs(path, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    for i in range(n_files):
        part = table.slice(i * per, per)
        pq.write_table(
            part, os.path.join(path, f"part-{i:04d}.parquet"),
            row_group_size=row_group_docs,
        )
    return path
