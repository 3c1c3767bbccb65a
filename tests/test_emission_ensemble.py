"""Golden tests for BIO emission, dictify/harvest and ensemble resolution
(reference batched_main_NER.py:130-156, 520-551;
ensemble/aggregate_server_json.py:77-394, 461-535)."""

from unsupervised_ner_ray.assets import SERVERS_CONFIG, build_entity_map
from unsupervised_ner_ray.backends import default_backends
from unsupervised_ner_ray.functions import emission, ensemble
from unsupervised_ner_ray.functions.tagger import ensemble_tag_sentence, tag_sentence

EMAP = build_entity_map()


def test_emit_bio():
    tags = emission.emit_bio(
        ["a", "b", "c", "d"], [1, 1, 0, 1], ["GENE[PROTEIN]", "DISEASE"]
    )
    assert tags == [
        ("a", "B_GENE[PROTEIN]"),
        ("b", "I_GENE[PROTEIN]"),
        ("c", "O"),
        ("d", "B_DISEASE"),
    ]


def test_to_conll_bytes():
    s = emission.to_conll([("a", "B_X"), ("b", "O")])
    assert s == "a B_X\nb O\n\n"


def test_dictify_ner_harvest():
    # blank-context probe: empty token carrying the B_ tag, >3 positions
    tags = [("w1", "O"), ("w2", "O"), ("w3", "O"), ("", "B_DISEASE[PARK]")]
    ret, refs, harvest = emission.dictify_ner(tags)
    assert ret["4"] == {"term": "empty", "e": "B_DISEASE[PARK]"}
    assert refs == ["4"]
    # harvested label: bracket content stripped to last token, B_ prefix removed
    assert harvest == [("w3", "PARK")]


def test_prefix_strip_and_flip():
    assert ensemble.prefix_strip("B_GENE") == ("GENE", "B_")
    assert ensemble.prefix_strip("GENE") == ("GENE", "")
    assert ensemble.strip_prefixes("B_GENE/I_LOC") == "GENE/LOC"
    flipped = ensemble.flip_category({"e": "B_GENE[PROTEIN]"})
    assert flipped["e"] == "B_PROTEIN[GENE]"
    assert ensemble.flip_category({"e": "O"})["e"] == "O"


def test_get_predictions_above_threshold():
    preds = {
        "cs_distribution": [
            {"e": "GENE", "confidence": 0.6},
            {"e": "DISEASE", "confidence": 0.3},
            {"e": "OTHER", "confidence": 0.1},
        ]
    }
    # mean = 1/3; keep the prefix >= mean
    out = ensemble.get_predictions_above_threshold(preds)
    assert [o["e"] for o in out] == ["GENE"]


def _mk_result(tags, detected, dist_per_span):
    """Minimal model result for ensemble tests: dist_per_span maps span ->
    ordered [(class, conf)]."""
    pooled, orig = [], []
    for spans in dist_per_span:
        pooled.append(
            {
                e: {"e": e, "confidence": c, "stypes": {e: 1.0}}
                for e, c in spans
            }
        )
        orig.append([{"e": e, "confidence": c} for e, c in spans])
    return emission.build_model_result(tags, detected, pooled, orig, orig)


def test_ensemble_agreement_picks_precedence_server():
    tags = [("imatinib", "B_GENE[PROTEIN]"), ("works", "O")]
    r_bio = _mk_result(tags, ["GENE[PROTEIN]"], [[("GENE", 0.9), ("OTHER", 0.1)]])
    r_phi = _mk_result(tags, ["GENE[PROTEIN]"], [[("GENE", 0.8), ("OTHER", 0.2)]])
    out = ensemble.ensemble_processing([r_bio, r_phi], SERVERS_CONFIG)
    # GENE is in bio precedence -> bio picked; flip_category display form
    assert out["ensembled_ner"]["1"]["e"] == "B_PROTEIN[GENE]"
    assert out["ensembled_ner"]["2"]["e"] == "O"
    assert out["inferred_entities"] == [("imatinib", "B_PROTEIN[GENE]")]


def test_ensemble_one_server_says_o():
    tags_bio = [("x", "B_DISEASE[DISEASE]")]
    tags_phi = [("x", "O")]
    r_bio = _mk_result(tags_bio, ["DISEASE[DISEASE]"], [[("DISEASE", 1.0)]])
    r_phi = _mk_result(tags_phi, [], [])
    out = ensemble.ensemble_processing([r_bio, r_phi], SERVERS_CONFIG)
    assert out["ensembled_ner"]["1"]["e"] == "B_DISEASE[DISEASE]"


def test_ensemble_disagreement_emits_composite():
    tags_bio = [("x", "B_DISEASE[DISEASE]")]
    tags_phi = [("x", "B_PERSON[PERSON]")]
    r_bio = _mk_result(tags_bio, ["DISEASE[DISEASE]"], [[("DISEASE", 0.9), ("OTHER", 0.1)]])
    r_phi = _mk_result(tags_phi, ["PERSON[PERSON]"], [[("PERSON", 0.7), ("OTHER", 0.3)]])
    out = ensemble.ensemble_processing([r_bio, r_phi], SERVERS_CONFIG)
    e = out["ensembled_ner"]["1"]["e"]
    # neither cross-predicts (each within own domain) -> both emitted,
    # higher-confidence (bio) first
    assert e == "B_DISEASE[DISEASE]/B_PERSON[PERSON]"


def test_ensemble_cross_prediction_dropped():
    # bio predicts PERSON (a cross-prediction for bio), phi predicts PERSON
    # domain-correctly at the same position but different main class
    tags_bio = [("x", "B_LANGUAGE[LANGUAGE]")]
    tags_phi = [("x", "B_PERSON[PERSON]")]
    r_bio = _mk_result(tags_bio, ["LANGUAGE[LANGUAGE]"], [[("LANGUAGE", 0.9), ("OTHER", 0.1)]])
    r_phi = _mk_result(tags_phi, ["PERSON[PERSON]"], [[("PERSON", 0.9), ("OTHER", 0.1)]])
    out = ensemble.ensemble_processing([r_bio, r_phi], SERVERS_CONFIG)
    # LANGUAGE not in bio's precedence/common -> bio cross-predicts -> phi wins
    assert out["ensembled_ner"]["1"]["e"] == "B_PERSON[PERSON]"


def test_ensemble_span_length_mismatch_truncates():
    tags_bio = [("a", "B_DISEASE[DISEASE]"), ("b", "I_DISEASE[DISEASE]")]
    tags_phi = [("a", "B_DISEASE[DISEASE]"), ("b", "O")]
    r_bio = _mk_result(tags_bio, ["DISEASE[DISEASE]"], [[("DISEASE", 1.0)]])
    r_phi = _mk_result(tags_phi, ["DISEASE[DISEASE]"], [[("DISEASE", 1.0)]])
    out = ensemble.ensemble_processing([r_bio, r_phi], SERVERS_CONFIG)
    # min span length = 1 -> position 2 resolved independently (O vs I_)
    assert out["ensembled_ner"]["1"]["e"].startswith("B_")
    assert "2" in out["ensembled_ner"]


def test_full_sentence_ensemble_structural():
    backends = default_backends()
    res = ensemble_tag_sentence(
        "Mesothelioma:__entity__ is caused by asbestos:__entity__",
        backends, EMAP,
    )
    assert len(res["ensembled_tags"]) == len(res["tokens"])
    assert res["ensembled_tags"][1] == "O"
    assert res["ensembled_tags"][0] != "O"
    # deterministic: same input -> same output
    res2 = ensemble_tag_sentence(
        "Mesothelioma:__entity__ is caused by asbestos:__entity__",
        backends, EMAP,
    )
    assert res["ensembled_tags"] == res2["ensembled_tags"]


def test_tag_sentence_result_shape():
    backends = default_backends()
    r = tag_sentence("Imatinib:__entity__ treats nsclc:__entity__", backends[0], EMAP)
    result = r["result"]
    assert result["detected_entity_phrases_count"] == 2
    assert set(result["entity_distribution"].keys()) == {"1", "3"}
    for pos in ("1", "3"):
        dist = result["entity_distribution"][pos]["cs_distribution"]
        assert abs(sum(d["confidence"] for d in dist) - 1.0) < 0.01
