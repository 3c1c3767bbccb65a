"""Knowledge-graph construction primitives (pure, row-local parts).

The reference stops at tagged sentences; these engine-new stages (mandated by
BASELINE.json north_rule) turn tags into triples / linked mentions.  The
distributed parts (canonicalization groupby, adjacency materialize) live in
stages/kg.py; everything here is per-sentence.

Triple rule (deterministic, shared by engine and oracle): entity spans are the
maximal B_/I_ runs of non-O ensembled tags; consecutive span pairs form
(subj, pred, obj) with the predicate = up to ``max_predicate_tokens``
lowercased tokens strictly between the two spans (``"related_to"`` when
adjacent).  Types are the base class of the span's B_ tag (composite ``A/B``
tags keep the first alternative, subtype annotation stripped).
"""

from __future__ import annotations

import hashlib
import re

_PUNCT_EDGE = re.compile(r"^\W+|\W+$", re.UNICODE)
_WS = re.compile(r"\s+")


def tag_base_class(tag: str) -> str:
    """``B_GENE[PROTEIN]/LOCATION[X]`` -> ``GENE``; ``O`` -> ``O``."""
    if tag == "O":
        return "O"
    t = tag
    if t.startswith("B_") or t.startswith("I_"):
        t = t[2:]
    return t.split("/")[0].split("[")[0]


def extract_entity_spans(tokens: list[str], tags: list[str]) -> list[dict]:
    """Maximal non-O runs -> [{"start","end","surface","etype"}] (end excl.).

    A span starts at a B_ tag (or a stray I_/bare tag after an O) and extends
    through following I_ tags.
    """
    spans: list[dict] = []
    i = 0
    n = len(tags)
    while i < n:
        if tags[i] == "O":
            i += 1
            continue
        start = i
        etype = tag_base_class(tags[i])
        i += 1
        while i < n and tags[i] != "O" and tags[i].startswith("I_"):
            i += 1
        spans.append(
            {
                "start": start,
                "end": i,
                "surface": " ".join(tokens[start:i]),
                "etype": etype,
            }
        )
    return spans


def extract_triples(
    tokens: list[str], tags: list[str], max_predicate_tokens: int = 5
) -> list[dict]:
    """Consecutive entity-span pairs -> (subj, pred, obj) triples."""
    spans = extract_entity_spans(tokens, tags)
    triples = []
    for a, b in zip(spans, spans[1:]):
        between = tokens[a["end"]: b["start"]]
        pred = " ".join(w.lower() for w in between[:max_predicate_tokens])
        triples.append(
            {
                "subj": a["surface"],
                "subj_type": a["etype"],
                "pred": pred if pred else "related_to",
                "obj": b["surface"],
                "obj_type": b["etype"],
            }
        )
    return triples


def normalize_surface(surface: str) -> str:
    """Canonical surface key: casefold, strip edge punctuation per token,
    collapse whitespace.  (Reference analog: lowercased keys in the bootstrap
    vocabulary, ner_labeling/construct_bs.py:21.)"""
    toks = [_PUNCT_EDGE.sub("", t) for t in surface.casefold().split()]
    return _WS.sub(" ", " ".join(t for t in toks if t)).strip()


def entity_id(norm_surface: str) -> str:
    """Deterministic 16-hex canonical entity id — content-addressed, so ids
    need no coordination/shuffle to assign."""
    return hashlib.md5(norm_surface.encode("utf-8", "surrogatepass")).hexdigest()[:16]
