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

def test_window_r5_contract():
    """Round-5 window: exactly 50 names, all resolvable, queries() leads
    with them in order; every never-before-certified oracle-backed query is
    inside, AND every query never RECORDED in any prior driver window is
    inside (so after this round every battery entry has a driver record);
    the only rows-only window entries are the 12 rotated never-recorded
    queries plus the new rows-only round-5 operators (pHash
    near-dup, audio/video fingerprints, harmonic centrality, k-core, spectral graph embeddings, HITS); q_kg_walks and
    q_kg_skipgram are SQL-pinned via the walks dump twins."""
    import json

    qs = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    W = entrymod._WINDOW_R5
    assert len(W) == 50 and len(set(W)) == 50
    assert qs[:50] == W
    ever_hash, ever_recorded = set(), set()
    for r in (1, 2, 3, 4):
        try:
            with open(f"/root/repo/CORRECTNESS_r0{r}.json") as f:
                d = json.load(f)
        except FileNotFoundError:
            continue
        ever_recorded |= set(d)
        ever_hash |= {k for k, v in d.items() if v.get("hash_match") is True}
    stranded_oracle = [
        q for q in qs if q in oracles and q not in ever_hash and q not in W
    ]
    assert not stranded_oracle, stranded_oracle
    never_recorded = [q for q in qs if q not in ever_recorded and q not in W]
    assert not never_recorded, never_recorded
    rows_only = [q for q in W if q not in oracles]
    assert rows_only == [
        "q_kmv_users",
        "q_semantic_dedup",
        "q_dsir_select",
        "q_bpe_encode",
        "q_kg_communities",
        "q_kg_ppr",
        "q_pca_top",
        "q_bpe_train",
        "q_bootstrap_mean",
        "q_pq_topk",
        "q_tdigest_by_type",
        "q_frame_sample",
        "q_two_hop_approx",
        "q_cms_counts",
        "q_kg_embed",
        "q_kg_hits",
        "q_kg_negatives",
        "q_image_phash",
        "q_audio_fingerprint",
        "q_video_fingerprint",
        "q_kg_centrality",
        "q_kg_kcore",
    ], rows_only


def test_check_oracles_window_mode_selects_first_n():
    """--window N checks exactly the first N queries() entries (regression
    guard: a reorder can't silently push a failing oracle out of driver
    sight).  Pin the selection logic without running the queries."""
    import tools.check_oracles as co

    names = list(entrymod.queries())[:50]
    seen = {}

    def fake_main(sf_dir, only=None):
        seen["only"] = only
        return 0

    orig = co.main
    try:
        co.main = fake_main
        assert co.main_window("/nonexistent", 50) == 0
    finally:
        co.main = orig
    assert seen["only"] == names
