"""Driver-contract smoke: entry()/queries()/oracle_sql() shapes."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, missing
    assert len(qs) >= 25
    assert len(oracles) >= 15


def test_entry_runs(ray_session):
    ds = entrymod.entry()
    t = ds.take(3)
    assert len(t) == 3
    cols = set(t[0].keys())
    assert {"doc_id", "spans", "ner", "triples", "mentions", "harvest"} <= cols


def test_one_query_runs(ray_session):
    qs = entrymod.queries()
    out = qs["q1_lineitem_agg"]("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert {"l_returnflag", "sum_qty", "n_rows"} <= set(out.columns)


def test_entry_includes_plain_text_corpus(ray_session):
    """entry() tags BOTH corpus shapes in one pass: the interleaved adapter
    docs and a plain-text-only slice (reference sample_test.txt shape,
    main_NER.py:225-230) whose spans come from the POS fallback."""
    ds = entrymod.entry()
    df = ds.to_pandas()
    plain = df[df["doc_id"].str.startswith("plain-")]
    inter = df[df["doc_id"].str.startswith("doc-")]
    assert len(plain) == 200 and len(inter) == 200
    # POS fallback must find real spans in unmarked prose
    assert sum(len(m) for m in plain["mentions"]) > 0
    # plain docs carry exactly one span and it is unmarked text
    spans = plain["spans"].iloc[0]
    assert len(spans) == 1 and spans[0]["kind"] == "text"
    assert "__" not in spans[0]["text"]


def test_ner_dump_queries_in_gate_window():
    """The dump-backed NER queries must sit inside the driver's 50-entry
    correctness window and have oracle twins."""
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    for name in ("q_ner_tags", "q_ner_mention_groups", "q_kg_adjacency_ner"):
        assert name in oracles
        assert qs.index(name) < 50
    assert len(oracles) >= 55
