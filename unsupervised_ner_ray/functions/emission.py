"""BIO tag emission and the per-sentence structured result (reference D13).

* emit_bio            — mirrors ``emit_sentence_entities``
                        /root/reference/batched_main_NER.py:520-551
* dictify_ner         — mirrors ``dictify_ner_response`` :130-156 including
                        the CI-label harvest side-channel (returned, not
                        written to a file)
* build_model_result  — assembles the JSON-service-shaped dict
                        (:278-308) consumed by the ensemble stage; keys are
                        stringified 1-based token positions exactly like the
                        reference wire format.
"""

from __future__ import annotations


def emit_bio(
    tokens: list[str], span_arr: list[int], detected: list[str]
) -> list[tuple[str, str]]:
    """(token, tag) pairs; tag in O | B_<pred> | I_<pred>
    (reference batched_main_NER.py:520-551)."""
    assert len(tokens) == len(span_arr)
    out: list[tuple[str, str]] = []
    entity_index = 0
    in_span = False
    for tok, flag in zip(tokens, span_arr):
        if flag == 0:
            tag = "O"
            if in_span:
                in_span = False
                entity_index += 1
        elif in_span:
            tag = "I_" + detected[entity_index]
        else:
            in_span = True
            tag = "B_" + detected[entity_index]
        out.append((tok, tag))
    return out


def to_conll(tags: list[tuple[str, str]]) -> str:
    """Exact reference byte format: ``token TAG`` lines + blank separator."""
    return "".join(f"{t} {tag}\n" for t, tag in tags) + "\n"


def dictify_ner(
    tags: list[tuple[str, str]]
) -> tuple[dict[str, dict], list[str], list[tuple[str, str]]]:
    """Position-keyed ner dict + B_-tag positions + harvested CI labels.

    Mirrors ``dictify_ner_response`` (batched_main_NER.py:130-156): empty
    tokens become ``"empty"``, and for blank-context probes with >3 tokens the
    (previous term, stripped label) pair is harvested for bootstrap labeling.
    Returns (ner dict keyed by str(position), ref_indices, harvest pairs).
    """
    ret: dict[str, dict] = {}
    ref_indices: list[str] = []
    harvest: list[tuple[str, str]] = []
    count = 1
    for term, tag in tags:
        key = str(count)
        if term:
            ret[key] = {"term": term, "e": tag}
            if tag != "O" and tag.startswith("B_"):
                ref_indices.append(key)
            count += 1
        else:
            ret[key] = {"term": "empty", "e": tag}
            if tag != "O" and tag.startswith("B_"):
                ref_indices.append(key)
            count += 1
            if len(ret) > 3:
                out = tag.replace("[", " ").replace("]", "").split()[-1]
                if out.startswith("B_"):
                    out = "_".join(out.split("_")[1:])
                prev = ret[str(count - 2)]["term"]
                harvest.append((prev, out))
    return ret, ref_indices, harvest


def build_model_result(
    tags: list[tuple[str, str]],
    detected: list[str],
    pooled_per_span: list[dict[str, dict]],
    orig_cs_per_span: list[list[dict]],
    orig_ci_per_span: list[list[dict]],
    cs_descs_per_span: list[list[dict]] | None = None,
    ci_descs_per_span: list[list[dict]] | None = None,
) -> dict:
    """Per-sentence result in the reference JSON service shape
    (batched_main_NER.py:278-308): all detail maps keyed by the stringified
    position of each span's B_ tag."""
    ner, ref_indices, harvest = dictify_ner(tags)
    n = len(detected)
    assert len(ref_indices) == n, (ref_indices, detected, tags)
    pooled_pred: dict[str, dict] = {}
    cs_aux: dict[str, dict] = {}
    ci_aux: dict[str, dict] = {}
    orig_cs: dict[str, dict] = {}
    orig_ci: dict[str, dict] = {}
    for i in range(n):
        pos = ref_indices[i]
        pooled_pred[pos] = {
            "e": detected[i],
            "cs_distribution": list(pooled_per_span[i].values()),
        }
        cs_aux[pos] = {
            "e": detected[i],
            "cs_descs": cs_descs_per_span[i] if cs_descs_per_span else [],
        }
        ci_aux[pos] = {"ci_descs": ci_descs_per_span[i] if ci_descs_per_span else []}
        orig_cs[pos] = {"e": detected[i], "cs_distribution": orig_cs_per_span[i]}
        orig_ci[pos] = {"e": detected[i], "cs_distribution": orig_ci_per_span[i]}
    return {
        "total_terms_count": len(ner),
        "detected_entity_phrases_count": n,
        "ner": ner,
        "entity_distribution": pooled_pred,
        "cs_prediction_details": cs_aux,
        "ci_prediction_details": ci_aux,
        "orig_cs_prediction_details": orig_cs,
        "orig_ci_prediction_details": orig_ci,
        "harvest": harvest,
    }
