"""Byte-exact CoNLL golden, hand-derived from the reference emit loop
(/root/reference/batched_main_NER.py:520-551): per token
``terms_arr[i] + ' ' + tag + "\\n"``, one blank line after each sentence;
B_ on span entry, I_ inside, O elsewhere, entity_index advances when a span
closes."""


def test_emit_bio_to_conll_reference_bytes():
    from unsupervised_ner_ray.functions.emission import emit_bio, to_conll

    tokens = ["Imatinib", "mesylate", "is", "a", "drug"]
    span_arr = [1, 1, 0, 0, 1]
    detected = ["DRUG[ABC]", "THING[X]"]
    tags = emit_bio(tokens, span_arr, detected)
    # hand-stepped through batched_main_NER.py:529-547:
    # i=0 span=1 !in_span -> B_ + detected[0]; i=1 span=1 in_span -> I_;
    # i=2 span=0 closes span (entity_index -> 1); i=4 span=1 -> B_ + detected[1]
    expected = (
        "Imatinib B_DRUG[ABC]\n"
        "mesylate I_DRUG[ABC]\n"
        "is O\n"
        "a O\n"
        "drug B_THING[X]\n"
        "\n"
    )
    assert to_conll(tags) == expected

    # singleton sentence: one-token span, file still gets the blank separator
    assert to_conll(emit_bio(["engineer"], [1], ["PERSON[p]"])) == (
        "engineer B_PERSON[p]\n\n"
    )

    # all-O sentence (no spans survived filtering)
    assert to_conll(emit_bio(["just", "words"], [0, 0], [])) == "just O\nwords O\n\n"


def test_write_conll_file_bytes(ray_session, tmp_path):
    """End-to-end: a tiny tagged dataset renders to the exact reference
    byte layout (doc order by doc_id, sentences in ner-list order)."""
    import ray.data as rd

    from unsupervised_ner_ray.sources.io import write_conll

    rows = [
        {
            "doc_id": "doc-b",
            "ner": [
                {"span_idx": 0, "tokens": ["engineer"], "tags": ["B_PERSON[p]"],
                 "bio_tags": ["B_PERSON[p]"], "phi_tags": ["O"]},
            ],
        },
        {
            "doc_id": "doc-a",
            "ner": [
                {"span_idx": 0, "tokens": ["Imatinib", "is", "good"],
                 "tags": ["B_DRUG[d]", "O", "O"],
                 "bio_tags": ["B_DRUG[d]", "O", "O"], "phi_tags": ["O", "O", "O"]},
                {"span_idx": 1, "tokens": ["so", "it", "goes"],
                 "tags": ["O", "O", "O"],
                 "bio_tags": ["O", "O", "O"], "phi_tags": ["O", "O", "O"]},
            ],
        },
    ]
    ds = rd.from_items(rows)
    out = tmp_path / "golden.conll"
    write_conll(ds, str(out))
    expected = (
        "Imatinib B_DRUG[d]\n"
        "is O\n"
        "good O\n"
        "\n"
        "so O\n"
        "it O\n"
        "goes O\n"
        "\n"
        "engineer B_PERSON[p]\n"
        "\n"
    )
    assert out.read_bytes().decode() == expected
