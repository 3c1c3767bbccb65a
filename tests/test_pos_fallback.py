"""Unmarked-text tagging via the POS-lite fallback (reference mode switch
main_NER.py:225-230: marker parsing when ``:__entity__`` is present, POS
detection otherwise) and the HF backend seam."""

import pytest

from unsupervised_ner_ray.functions import masking

# the reference's own plain-sentence batch file (/root/reference/sample_test.txt)
SAMPLE_TEST_SENTENCES = [
    "The myocardial infarction is routinely diagnosed by ECG",
    "Her hypohysitis secondary to ipilimumab was well managed with supplemental hormones",
    "She suffered from acute arthritis",
    "cats and dogs are pets",
    "Ajit Rajasekharan is an engineer",
    "engineer",
    "they flew from Boston to Rio De Janiro and had a mocha",
    "Imatinib mesylate is a drug and is used to treat nsclc",
]


def test_detect_terms_marker_switch():
    marked = "Imatinib:__entity__ is a drug"
    terms = masking.detect_terms(marked)
    assert terms[0] == ("Imatinib", masking.NOUN_TAGS[0])
    assert terms[1] == ("is", masking.RESET_POS_TAG)
    # unmarked -> heuristic path, function words RESET, content words nouned
    terms2 = masking.detect_terms("cats and dogs are pets")
    assert [t for _, t in terms2] == ["NN", "RESET", "NN", "RESET", "NN"]


def test_heuristic_pos_numbers_and_punct():
    terms = masking.heuristic_pos_terms("eGFR below 60 , really !")
    assert dict(terms)["60"] == "CD"
    assert dict(terms)[","] == masking.RESET_POS_TAG
    assert dict(terms)["!"] == masking.RESET_POS_TAG
    assert dict(terms)["eGFR"] == "NN"


def test_unmarked_sentences_tag_end_to_end():
    """Golden: every reference sample_test.txt sentence produces aligned
    tokens/tags and the expected span phrases under the POS-lite heuristic."""
    from unsupervised_ner_ray.assets import build_entity_map
    from unsupervised_ner_ray.backends import default_backends
    from unsupervised_ner_ray.functions.tagger import ensemble_tag_sentence

    emap = build_entity_map()
    backends = default_backends()

    expected_spans = {
        # content-word runs under the closed-class heuristic (pinned)
        "cats and dogs are pets": ["cats", "dogs", "pets"],
        "engineer": ["engineer"],
        "She suffered from acute arthritis": ["suffered", "acute arthritis"],
        "Ajit Rajasekharan is an engineer": ["Ajit Rajasekharan", "engineer"],
    }
    for sent in SAMPLE_TEST_SENTENCES:
        res = ensemble_tag_sentence(sent, backends, emap)
        assert len(res["tokens"]) == len(sent.split())
        assert len(res["ensembled_tags"]) == len(res["tokens"])
        # spans exist for every sentence with content words
        assert sum(res["span_arr"]) > 0
        phrases = masking.span_phrases(
            [(w, "NN") for w in res["tokens"]], res["span_arr"]
        )
        if sent in expected_spans:
            assert phrases == expected_spans[sent], (sent, phrases)
        # at least one span got a non-O ensembled tag
        assert any(t != "O" for t in res["ensembled_tags"]), (sent, res["ensembled_tags"])


def test_marked_sentences_unchanged_by_fallback():
    """The fallback must not disturb the marker path: a marked sentence tags
    identically whether or not a pos_backend is supplied."""
    from unsupervised_ner_ray.assets import build_entity_map
    from unsupervised_ner_ray.backends import default_backends
    from unsupervised_ner_ray.functions.tagger import ensemble_tag_sentence

    emap = build_entity_map()
    backends = default_backends()
    sent = "Imatinib:__entity__ mesylate:__entity__ is a drug and is used to treat nsclc:__entity__"
    a = ensemble_tag_sentence(sent, backends, emap)
    b = ensemble_tag_sentence(sent, backends, emap, pos_backend=masking.heuristic_pos_terms)
    assert a["ensembled_tags"] == b["ensembled_tags"]
    assert a["tokens"] == b["tokens"]


def test_hf_backend_gated_without_torch():
    """Without torch the HF backend must fail fast with NotImplementedError
    (the mock path is the tested one in this sandbox)."""
    try:
        import torch  # noqa: F401

        pytest.skip("torch present; the real-backend test below covers this")
    except ImportError:
        pass
    from unsupervised_ner_ray.backends import HFDescriptorBackend

    with pytest.raises(NotImplementedError):
        HFDescriptorBackend("bio", "bert-base-cased")


def test_hf_backend_predicts_with_torch():
    """Real-model smoke (runs only where torch+transformers are installed):
    descriptors come back ordered, scored, and signature-annotated."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from unsupervised_ner_ray.backends import HFDescriptorBackend

    be = HFDescriptorBackend("bio", "bert-base-cased", top_k=5)
    descs = be.predict("Imatinib is a __entity__", "drug", "cs")
    assert len(descs) == 5
    assert all(set(d) == {"desc", "v", "e", "e_count"} for d in descs)
    vs = [d["v"] for d in descs]
    assert vs == sorted(vs, reverse=True)
