"""Descriptor -> entity-signature aggregation and CI/CS confidence pooling.

Pure, row-local math mirroring the reference:
* softmax                         — /root/reference/batched_main_NER.py:27-30
* convert_positive_nums_to_dist   — :579-590 (round to 4 decimals)
* map_entities                    — :686-702 (consolidate + subtype counts)
* aggregate_entities              — :602-657 (softmax-weighted sum, stable
                                    sort => ties break by insertion order)
* pool_confidences                — :165-233 (CI+CS pooling, blank-CI skip)
* fill_detected_entities          — :457-467 (top-1 pick)
* pack_confidences                — :396-412 (orig dists for the ensemble)

Ordering is load-bearing: every sort here is Python's stable ``sorted`` over
insertion-ordered dicts, exactly like the reference's ``OrderedDict`` usage
(SURVEY.md §2.6 conformance trap).  float64 throughout; rounding only where
the reference rounds.
"""

from __future__ import annotations

import math

import numpy as np

OTHER = "OTHER"
UNTAGGED = "UNTAGGED_ENTITY"


def softmax(x) -> "np.ndarray | list[float]":
    """reference batched_main_NER.py:27-30.

    Identical math to ``np.exp(x - max) / sum``; descriptor signatures are
    tiny (2-10 entries), where the pure-Python path is ~5x faster than numpy
    dispatch and bit-identical (same float64 exp/sum/divide)."""
    vals = x.tolist() if isinstance(x, np.ndarray) else list(x)
    if len(vals) > 32:
        arr = np.asarray(x, dtype=np.float64)
        e_x = np.exp(arr - np.max(arr))
        return e_x / e_x.sum(axis=0)
    m = max(vals)
    e_x = [math.exp(v - m) for v in vals]
    # plain sequential sum matches np.sum's accumulation order bit-for-bit
    # (math.fsum's exact rounding can differ in the last ulp, and the tie
    # ordering downstream is load-bearing — see module docstring)
    s = sum(e_x)
    return [v / s for v in e_x]


def convert_positive_nums_to_dist(sorted_values: list[float]) -> list[float]:
    """Normalize positive factors to a 4-dp distribution
    (reference batched_main_NER.py:579-590; zero-sum guard sets factors[0]=1).
    Python ``round`` and ``np.round`` share half-to-even semantics, so this
    pure-Python version matches the reference's numpy rounding exactly.
    """
    factors = [float(v) for v in sorted_values]
    total = float(sum(factors))
    if total == 0:
        total = 1.0
        if factors:
            factors[0] = 1.0
    return [round(v / total, 4) for v in factors]


def map_entities(
    subtypes_in: list[str],
    counts_in: list[str],
    subtypes_dict: dict[str, dict[str, int]],
    emap: dict[str, str],
    suppress_untagged: bool,
) -> tuple[list[str], list[int]]:
    """Consolidate one descriptor's subtype signature via the entity map and
    accumulate per-group subtype counts ACROSS descriptors
    (reference batched_main_NER.py:686-702).  Duplicate groups within one
    signature are kept (the reference keeps them too)."""
    ret_arr: list[str] = []
    new_counts: list[int] = []
    for idx, term in enumerate(subtypes_in):
        if suppress_untagged and term in (OTHER, UNTAGGED):
            continue
        group = emap[term]
        ret_arr.append(group)
        cnt = int(counts_in[idx])
        new_counts.append(cnt)
        g = subtypes_dict.setdefault(group, {})
        g[term] = g.get(term, 0) + cnt
    return ret_arr, new_counts


def aggregate_entities(
    descs: list[dict],
    emap: dict[str, str],
    suppress_untagged: bool = True,
) -> tuple[list[str], list[float], dict[str, dict[str, int]]]:
    """Aggregate one masked position's descriptor predictions into an ordered
    entity distribution (reference batched_main_NER.py:602-657).

    ``descs``: ordered list of ``{"desc", "v", "e", "e_count"}`` structs where
    ``e`` is a '/'-joined subtype signature and ``e_count`` '/'-joined ints.

    Per descriptor: consolidate subtypes, softmax the kept count vector, add
    ``softmax_count[j] * float(v)`` to each consolidated group.  Empty result
    (everything suppressed) falls back to ``{OTHER: 1}``.

    Returns (annotated entity names ``GROUP[sub1,sub2]``, confidences,
    raw subtype-count dict keyed by group).
    """
    aggregated: dict[str, float] = {}
    subtypes: dict[str, dict[str, int]] = {}
    for d in descs:
        subtype_sig = str(d["e"]).split("/")
        count_sig = str(d["e_count"]).split("/")
        weight = float(d["v"])
        trunc_e, trunc_counts = map_entities(
            subtype_sig, count_sig, subtypes, emap, suppress_untagged
        )
        if not trunc_e:
            # All components suppressed; contributes nothing.  (The reference
            # would hit np.max on an empty array here — this input shape does
            # not occur in its deployment; we degrade gracefully.)
            continue
        soft = softmax(trunc_counts)
        for j, group in enumerate(trunc_e):
            aggregated[group] = aggregated.get(group, 0.0) + float(soft[j]) * weight
    # stable sort desc by value; ties keep insertion order (:636)
    final_sorted = dict(sorted(aggregated.items(), key=lambda kv: kv[1], reverse=True))
    if not final_sorted:
        final_sorted = {OTHER: 1}
        subtypes[OTHER] = {OTHER: 1}
    confidences = convert_positive_nums_to_dist(list(final_sorted.values()))
    ret_entities = list(final_sorted.keys())
    sorted_subtypes = sort_subtypes(subtypes)
    ret_entities = update_entities_with_subtypes(ret_entities, sorted_subtypes)
    return ret_entities, confidences, subtypes


def aggregate_entities_v1(
    descs: list[dict],
    emap: dict[str, str],
    suppress_untagged: bool = True,
) -> tuple[list[str], list[float], dict[str, dict[str, int]]]:
    """v1 aggregation variant (reference main_NER.py:541-590, 619-637):
    no softmax — each consolidated entity gets ``(count_j / sum(all counts))
    * desc_weight``; subtype accumulation counts OCCURRENCES (=1 per
    descriptor), not cluster counts.

    Faithful to the reference including its count-index quirk: ``count_j``
    indexes the ORIGINAL (unfiltered) count array with the position from the
    FILTERED entity array, so counts shift when a suppressed entry sits
    mid-signature (main_NER.py:559-566 with the ``continue`` at :624
    skipping ``index += 1``).
    """
    aggregated: dict[str, float] = {}
    subtypes: dict[str, dict[str, int]] = {}
    for d in descs:
        subtype_sig = str(d["e"]).split("/")
        count_sig = str(d["e_count"]).split("/")
        weight = float(d["v"])
        trunc_e: list[str] = []
        for term in subtype_sig:
            if suppress_untagged and term in (OTHER, UNTAGGED):
                continue
            group = emap[term]
            trunc_e.append(group)
            g = subtypes.setdefault(group, {})
            g[term] = g.get(term, 0) + 1
        s = sum(int(c) for c in count_sig)
        s = 1 if s == 0 else s
        for j, group in enumerate(trunc_e):
            w = (float(count_sig[j]) / s) * weight
            aggregated[group] = aggregated.get(group, 0.0) + w
    final_sorted = dict(sorted(aggregated.items(), key=lambda kv: kv[1], reverse=True))
    if not final_sorted:
        final_sorted = {OTHER: 1}
        subtypes[OTHER] = {OTHER: 1}
    confidences = convert_positive_nums_to_dist(list(final_sorted.values()))
    ret_entities = update_entities_with_subtypes(
        list(final_sorted.keys()), sort_subtypes(subtypes)
    )
    return ret_entities, confidences, subtypes


def sort_subtypes(subtypes: dict[str, dict[str, int]]) -> dict[str, list[str]]:
    """Per group: subtype names ordered by count desc, stable
    (reference batched_main_NER.py:660-665)."""
    return {
        ent: [k for k, _ in sorted(d.items(), key=lambda kv: kv[1], reverse=True)]
        for ent, d in subtypes.items()
    }


def update_entities_with_subtypes(
    ret_entities: list[str], sorted_sub: dict[str, list[str]]
) -> list[str]:
    """Annotate ``GROUP`` -> ``GROUP[sub1,sub2,...]``
    (reference batched_main_NER.py:667-678)."""
    return [
        ent + "[" + ",".join(sorted_sub[ent]) + "]" if ent in sorted_sub else ent
        for ent in ret_entities
    ]


def pool_confidences(
    ci: tuple[list[str], list[float], dict],
    cs: tuple[list[str], list[float], dict],
    is_blank_statement: bool,
) -> dict[str, dict]:
    """Pool CI and CS distributions per base class; blank-context sentences
    skip the CI side entirely (reference batched_main_NER.py:165-233).

    Returns ordered ``{class: {"e", "confidence", "stypes": {st: w}}}``.
    """
    ci_entities, ci_confidences, ci_subtypes = ci
    cs_entities, cs_confidences, cs_subtypes = cs
    main_classes: dict[str, float] = {}
    if not is_blank_statement:
        for e, c in zip(ci_entities, ci_confidences):
            main_classes[e.split("[")[0]] = float(c)
    for e, c in zip(cs_entities, cs_confidences):
        base = e.split("[")[0]
        main_classes[base] = main_classes.get(base, 0.0) + float(c)
    final_sorted = dict(sorted(main_classes.items(), key=lambda kv: kv[1], reverse=True))
    main_dist = convert_positive_nums_to_dist(list(final_sorted.values()))
    main_classes_arr = list(final_sorted.keys())

    subtype_factors: dict[str, dict[str, float]] = {}
    for e_class in final_sorted:
        if e_class in cs_subtypes:
            tgt = subtype_factors.setdefault(e_class, {})
            for st, w in cs_subtypes[e_class].items():
                tgt[st] = tgt.get(st, 0.0) + w
        if is_blank_statement:
            continue
        if e_class in ci_subtypes:
            tgt = subtype_factors.setdefault(e_class, {})
            for st, w in ci_subtypes[e_class].items():
                tgt[st] = tgt.get(st, 0.0) + w

    pooled: dict[str, dict] = {}
    for e, c in zip(main_classes_arr, main_dist):
        stypes = subtype_factors.get(e, {})
        st_sorted = dict(sorted(stypes.items(), key=lambda kv: kv[1], reverse=True))
        st_dist = convert_positive_nums_to_dist(list(st_sorted.values()))
        pooled[e] = {
            "e": e,
            "confidence": c,
            "stypes": {st: sd for st, sd in zip(st_sorted.keys(), st_dist)},
        }
    return pooled


def fill_detected_entities(pooled: dict[str, dict]) -> str:
    """Top class + its top subtype -> ``CLASS[subtype]`` or bare ``CLASS``
    (reference batched_main_NER.py:457-467)."""
    if not pooled:
        return OTHER
    top_e_class = next(iter(pooled))
    top_subtype = next(iter(pooled[top_e_class]["stypes"]))
    if top_e_class != top_subtype:
        return top_e_class + "[" + top_subtype + "]"
    return top_e_class


def pack_confidences(entities: list[str], confidences: list[float]) -> list[dict]:
    """Simplify annotated names to ``MAIN[top-sub]`` / bare ``MAIN`` and pair
    with confidences (reference batched_main_NER.py:396-412).  These "orig"
    dists feed the ensemble's cross-prediction detection."""
    out = []
    for e, c in zip(entities, confidences):
        split = e.split("[")
        e_main = split[0]
        if len(split) > 1:
            e_sub = split[1].split(",")[0].rstrip("]")
            e = e_main + "[" + e_sub + "]" if e_main != e_sub else e_main
        else:
            e = e_main
        out.append({"e": e, "confidence": c})
    return out
