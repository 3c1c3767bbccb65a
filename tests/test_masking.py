"""Golden tests for mention detection / masked-sentence generation
(reference semantics: ensemble/utils/common.py:15-79,
batched_main_NER.py:327-373)."""

from unsupervised_ner_ray.functions import masking


def test_parse_marked_terms():
    terms = masking.parse_marked_terms("Imatinib:__entity__ is a drug")
    assert terms == [
        ("Imatinib", "NFP"),
        ("is", "RESET"),
        ("a", "RESET"),
        ("drug", "RESET"),
    ]


def test_generate_masked_sentences_single_run():
    terms = masking.parse_marked_terms(
        "New:__entity__ York:__entity__ is a city"
    )
    sents, span_arr = masking.generate_masked_sentences(terms)
    # one maximal run of two marked tokens -> one masked copy
    assert sents == [["__entity__", "is", "a", "city"]]
    assert span_arr == [1, 1, 0, 0, 0]


def test_generate_masked_sentences_two_runs():
    terms = masking.parse_marked_terms(
        "Imatinib:__entity__ treats nsclc:__entity__ fast"
    )
    sents, span_arr = masking.generate_masked_sentences(terms)
    assert sents == [
        ["__entity__", "treats", "nsclc", "fast"],
        ["Imatinib", "treats", "__entity__", "fast"],
    ]
    assert span_arr == [1, 0, 1, 0]


def test_no_markers_no_spans():
    terms = masking.parse_marked_terms("plain words only")
    sents, span_arr = masking.generate_masked_sentences(terms)
    assert sents == []
    assert span_arr == [0, 0, 0]


def test_masked_word_first_letter_capitalize():
    f = masking.masked_word_first_letter_capitalize
    assert f("new york") == "New York"
    assert f("eGFR") == "eGFR"  # second char upper -> untouched
    assert f("a b") == "a b"  # single-char words untouched


def test_gen_ci_sentences():
    terms = masking.parse_marked_terms("imatinib:__entity__ treats nsclc")
    _, span_arr = masking.generate_masked_sentences(terms)
    assert masking.gen_ci_sentences(terms, span_arr) == ["Imatinib is a entity"]


def test_span_phrases_multiword():
    terms = masking.parse_marked_terms("New:__entity__ York:__entity__ rocks")
    _, span_arr = masking.generate_masked_sentences(terms)
    assert masking.span_phrases(terms, span_arr) == ["New York"]


def test_blank_entity_sentence():
    assert masking.is_blank_entity_sentence("parkinson's :__entity__")
    assert masking.is_blank_entity_sentence("parkinson's :__entity__\n")
    assert not masking.is_blank_entity_sentence("parkinson's:__entity__ x")


def test_filter_common_noun_spans():
    terms = masking.parse_marked_terms(
        "the:__entity__ imatinib:__entity__ helps but the:__entity__ end"
    )
    sents, span_arr = masking.generate_masked_sentences(terms)
    assert span_arr == [1, 1, 0, 0, 1, 0]
    kept, new_span = masking.filter_common_noun_spans(
        span_arr, sents, terms, frozenset({"the"})
    )
    # the first span contains imatinib -> kept; the lone "the" span dropped
    assert new_span == [1, 1, 0, 0, 0, 0]
    assert len(kept) == 1
