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
