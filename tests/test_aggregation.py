"""Golden tests for descriptor aggregation + pooling
(reference batched_main_NER.py:165-233, 579-590, 602-657)."""

import numpy as np
import pytest

from unsupervised_ner_ray.assets import build_entity_map
from unsupervised_ner_ray.functions import aggregation as agg

EMAP = build_entity_map()
T = "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE"


def test_softmax_matches_reference_formula():
    x = np.array([10.0, 5.0])
    s = agg.softmax(x)
    e = np.exp(x - 10.0)
    assert np.allclose(s, e / e.sum())


def test_convert_positive_nums_to_dist():
    assert agg.convert_positive_nums_to_dist([3.0, 1.0]) == [0.75, 0.25]
    # zero-sum guard (reference :585): factors[0] forced to 1
    assert agg.convert_positive_nums_to_dist([0.0, 0.0]) == [1.0, 0.0]


def test_aggregate_entities_single_descriptor():
    descs = [{"desc": "d1", "v": 0.5, "e": "DRUG/DISEASE", "e_count": "10/5"}]
    entities, confidences, subtypes = agg.aggregate_entities(descs, EMAP)
    soft = agg.softmax(np.array([10.0, 5.0]))
    expected = agg.convert_positive_nums_to_dist([soft[0] * 0.5, soft[1] * 0.5])
    assert entities == [f"{T}[DRUG]", "DISEASE[DISEASE]"]
    assert confidences == expected
    assert subtypes == {T: {"DRUG": 10}, "DISEASE": {"DISEASE": 5}}


def test_aggregate_entities_subtypes_accumulate_across_descriptors():
    descs = [
        {"desc": "a", "v": 0.5, "e": "DRUG", "e_count": "10"},
        {"desc": "b", "v": 0.3, "e": "CHEMICAL_SUBSTANCE/DRUG", "e_count": "4/2"},
    ]
    entities, confidences, subtypes = agg.aggregate_entities(descs, EMAP)
    # both descriptors consolidate into the same group
    assert subtypes == {T: {"DRUG": 12, "CHEMICAL_SUBSTANCE": 4}}
    assert entities == [f"{T}[DRUG,CHEMICAL_SUBSTANCE]"]
    assert confidences == [1.0]


def test_aggregate_entities_all_untagged_falls_back_to_other():
    descs = [{"desc": "x", "v": 0.9, "e": "UNTAGGED_ENTITY", "e_count": "7"}]
    entities, confidences, subtypes = agg.aggregate_entities(
        descs, EMAP, suppress_untagged=True
    )
    assert entities == ["OTHER[OTHER]"]
    assert confidences == [1.0]
    assert subtypes == {"OTHER": {"OTHER": 1}}


def test_aggregate_entities_untagged_kept_when_not_suppressed():
    descs = [{"desc": "x", "v": 0.9, "e": "UNTAGGED_ENTITY", "e_count": "7"}]
    entities, _, _ = agg.aggregate_entities(descs, EMAP, suppress_untagged=False)
    assert entities == ["UNTAGGED_ENTITY[UNTAGGED_ENTITY]"]


def test_pool_confidences_tie_keeps_ci_first():
    ci = (["DISEASE[DISEASE]"], [1.0], {"DISEASE": {"DISEASE": 5}})
    cs = (["GENE[PROTEIN]"], [1.0], {"GENE": {"PROTEIN": 3}})
    pooled = agg.pool_confidences(ci, cs, is_blank_statement=False)
    # equal confidences: stable sort keeps CI insertion order
    assert list(pooled.keys()) == ["DISEASE", "GENE"]
    assert pooled["DISEASE"]["confidence"] == 0.5
    assert pooled["DISEASE"]["stypes"] == {"DISEASE": 1.0}


def test_pool_confidences_blank_skips_ci():
    ci = (["DISEASE[DISEASE]"], [1.0], {"DISEASE": {"DISEASE": 5}})
    cs = (["GENE[PROTEIN]"], [1.0], {"GENE": {"PROTEIN": 3}})
    pooled = agg.pool_confidences(ci, cs, is_blank_statement=True)
    assert list(pooled.keys()) == ["GENE"]
    assert pooled["GENE"]["confidence"] == 1.0


def test_pool_confidences_sums_same_class():
    ci = (["GENE[PROTEIN]"], [0.6], {"GENE": {"PROTEIN": 2}})
    cs = (["GENE[ENZYME]"], [1.0], {"GENE": {"ENZYME": 5}})
    pooled = agg.pool_confidences(ci, cs, is_blank_statement=False)
    assert list(pooled.keys()) == ["GENE"]
    assert pooled["GENE"]["confidence"] == 1.0  # 1.6/1.6 normalized
    # subtype pooling: CS counts added before CI (reference :191-211)
    assert list(pooled["GENE"]["stypes"].keys()) == ["ENZYME", "PROTEIN"]


def test_fill_detected_entities():
    pooled = {
        "GENE": {"e": "GENE", "confidence": 0.8, "stypes": {"PROTEIN": 1.0}},
        "OTHER": {"e": "OTHER", "confidence": 0.2, "stypes": {"OTHER": 1.0}},
    }
    assert agg.fill_detected_entities(pooled) == "GENE[PROTEIN]"
    pooled2 = {"OTHER": {"e": "OTHER", "confidence": 1.0, "stypes": {"OTHER": 1.0}}}
    assert agg.fill_detected_entities(pooled2) == "OTHER"
    assert agg.fill_detected_entities({}) == "OTHER"


def test_pack_confidences():
    packed = agg.pack_confidences(
        ["GENE[PROTEIN,ENZYME]", "DISEASE[DISEASE]", "OTHER"], [0.5, 0.3, 0.2]
    )
    assert packed == [
        {"e": "GENE[PROTEIN]", "confidence": 0.5},
        {"e": "DISEASE", "confidence": 0.3},
        {"e": "OTHER", "confidence": 0.2},
    ]
