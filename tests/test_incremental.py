"""Incremental corpus append (pipelines/incremental.py) — append-then-verify:
incremental merged views must equal a FULL recompute over the concatenated
corpus, exactly (VERDICT r4 item 9).

Corpus split: one deterministic 240-doc table sliced into A (180 docs) and
B (60 docs) so doc ids are disjoint and the union equals the one-shot
corpus byte-for-byte.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from unsupervised_ner_ray.corpus import make_documents
from unsupervised_ner_ray.pipelines.flagship import (
    run_flagship,
    run_flagship_checkpointed,
)
from unsupervised_ner_ray.pipelines.incremental import (
    append_flagship,
    merged_adjacency,
    merged_entities,
    merged_table,
)
from unsupervised_ner_ray.sources.io import read_documents


@pytest.fixture(scope="module")
def corpus_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("incr")
    table = make_documents(240, seed=7)
    a_dir, b_dir = str(root / "corpus_a"), str(root / "corpus_b")
    os.makedirs(a_dir), os.makedirs(b_dir)
    # multi-file layout so the checkpointed run shards by fragment
    pq.write_table(table.slice(0, 90), a_dir + "/part-0000.parquet")
    pq.write_table(table.slice(90, 90), a_dir + "/part-0001.parquet")
    pq.write_table(table.slice(180, 30), b_dir + "/part-0000.parquet")
    pq.write_table(table.slice(210, 30), b_dir + "/part-0001.parquet")
    return a_dir, b_dir, str(root / "out")


@pytest.fixture(scope="module")
def appended(ray_session, corpus_dirs):
    a_dir, b_dir, out_dir = corpus_dirs
    first = run_flagship_checkpointed(a_dir, out_dir, num_shards=2)
    assert first["completed"] == [0, 1]
    app = append_flagship(out_dir, b_dir, num_shards=2)
    assert app["completed"] == [0, 1]
    assert app["generation_dir"].endswith("gen=0001")
    return out_dir


@pytest.fixture(scope="module")
def full_recompute(ray_session, corpus_dirs):
    a_dir, b_dir, _ = corpus_dirs
    docs = read_documents(
        [
            a_dir + "/part-0000.parquet",
            a_dir + "/part-0001.parquet",
            b_dir + "/part-0000.parquet",
            b_dir + "/part-0001.parquet",
        ]
    )
    return run_flagship(docs)


def test_append_entities_equal_full(appended, full_recompute):
    inc = (
        merged_entities(appended)
        .to_pandas()
        .sort_values("surface_norm")
        .reset_index(drop=True)
    )
    full = (
        full_recompute["entities"]
        .to_pandas()
        .sort_values("surface_norm")
        .reset_index(drop=True)
    )
    assert inc.equals(full)  # counts AND majority votes AND eids


def test_append_adjacency_equal_full(appended, full_recompute):
    inc = (
        merged_adjacency(appended)
        .to_pandas()
        .sort_values("subj_id")
        .reset_index(drop=True)
    )
    full = (
        full_recompute["adjacency"]
        .to_pandas()
        .sort_values("subj_id")
        .reset_index(drop=True)
    )
    assert list(inc["subj_id"]) == list(full["subj_id"])
    assert list(inc["degree"]) == list(full["degree"])
    assert list(inc["subj_norm"]) == list(full["subj_norm"])
    for got, want in zip(inc["neighbors"], full["neighbors"]):
        assert list(got) == list(want)


def test_append_triples_union(appended, full_recompute):
    inc = merged_table(appended, "triples")
    assert inc.count() == full_recompute["triples"].count()


def test_reappend_same_input_is_resume_not_duplicate(appended):
    before = merged_entities(appended).to_pandas()["n_mentions"].sum()
    # same input path -> resumes the existing generation; all shards are in
    # its manifest already, so nothing runs and counts cannot double
    b_dir = None
    import json

    with open(os.path.join(appended, "gen=0001", "_meta.json")) as fp:
        b_dir = json.load(fp)["input"]
    again = append_flagship(appended, b_dir, num_shards=2)
    assert again["completed"] == []
    assert again["skipped"] == [0, 1]
    after = merged_entities(appended).to_pandas()["n_mentions"].sum()
    assert after == before


def test_merged_view_without_appends(ray_session, corpus_dirs, tmp_path):
    """Gen-0-only layouts (no appends yet) serve merged views too."""
    a_dir, _, _ = corpus_dirs
    solo = str(tmp_path / "solo")
    run_flagship_checkpointed(a_dir, solo, num_shards=2)
    ents = merged_entities(solo).to_pandas()
    assert len(ents) > 0
    assert (ents["n_mentions"] > 0).all()
