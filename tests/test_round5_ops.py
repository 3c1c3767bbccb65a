"""Round-5 operator tests: perceptual-hash image near-dup + k-core."""

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")


def _rd():
    import ray.data as rd

    return rd


# ---------------------------------------------------------------------------
# pHash


def test_phash64_format_invariance_and_noise():
    """Same raster encoded as PPM/BMP/PNG/GIF decodes to identical pixels
    -> identical pHash; mild noise on a SMOOTH image moves the hash by at
    most a few bits; independent random rasters are far apart."""
    from unsupervised_ner_ray.functions import media_codecs as mc
    from unsupervised_ner_ray.stages.multimodal import phash64

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
    h_ref = phash64(img)
    # lossless containers decode to identical pixels -> identical hash
    for enc in (mc.encode_ppm, mc.encode_bmp, mc.encode_png):
        assert phash64(mc.decode_image(enc(img))) == h_ref
    # JPEG (quant=1) and GIF (median-cut palette) are lossy: close, not equal

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(phash64(mc.decode_image(mc.encode_jpeg(img))), h_ref) <= 8
    assert ham(phash64(mc.decode_image(mc.encode_gif(img))), h_ref) <= 8

    # smooth gradient: low-frequency mass dominates, so +/-2 pixel noise
    # flips only near-median sign bits (measured 2-8 across seeds; an
    # unrelated raster sits at ~32)
    gx = np.linspace(0, 255, 64)[None, :]
    gy = np.linspace(0, 255, 48)[:, None]
    smooth = np.clip(gx + gy, 0, 255)[..., None].repeat(3, axis=2).astype(np.uint8)
    noisy = np.clip(
        smooth.astype(np.int64) + rng.randint(-2, 3, smooth.shape), 0, 255
    ).astype(np.uint8)
    assert ham(phash64(smooth), phash64(noisy)) <= 12

    other = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
    assert ham(h_ref, phash64(other)) > 10


def test_phash_image_pairs_planted(ray_session):
    """Two planted dup groups (same raster, different container format)
    come back as hamming-0 pairs; unrelated images produce no pairs."""
    from unsupervised_ner_ray.functions import media_codecs as mc
    from unsupervised_ner_ray.stages.multimodal import phash_image_pairs

    rd = _rd()
    rng = np.random.RandomState(11)
    imgs = [rng.randint(0, 256, (32, 32, 3)).astype(np.uint8) for _ in range(4)]
    rows = [
        ("img-0a", mc.encode_ppm(imgs[0])),
        ("img-0b", mc.encode_bmp(imgs[0])),
        ("img-1a", mc.encode_png(imgs[1])),
        ("img-1b", mc.encode_ppm(imgs[1])),
        ("img-2", mc.encode_ppm(imgs[2])),
        ("img-3", mc.encode_bmp(imgs[3])),
    ]
    tbl = pa.table(
        {
            "media_ref": pa.array([r for r, _ in rows], pa.string()),
            "kind": pa.array(["image"] * len(rows), pa.string()),
            "payload": pa.array([p for _, p in rows], pa.binary()),
        }
    )
    pairs = phash_image_pairs(rd.from_arrow(tbl), max_hamming=3, num_parts=4).to_pandas()
    got = {tuple(sorted((a, b))): h for a, b, h in pairs.itertuples(index=False)}
    assert got.get(("img-0a", "img-0b")) == 0
    assert got.get(("img-1a", "img-1b")) == 0
    assert len(got) == 2, got


def test_phash_quarantines_corrupt_payload(ray_session):
    """A truncated buffer degrades to phash_ok=false for that ROW only;
    the rest of the batch still hashes (MediaDecoder's quarantine
    contract)."""
    from unsupervised_ner_ray.functions import media_codecs as mc
    from unsupervised_ner_ray.stages.multimodal import phash_media

    rd = _rd()
    img = np.full((16, 16, 3), 128, np.uint8)
    tbl = pa.table(
        {
            "media_ref": pa.array(["ok", "bad"], pa.string()),
            "kind": pa.array(["image", "image"], pa.string()),
            "payload": pa.array([mc.encode_png(img), b"\x89PNG\r\n\x1a\n trunc"], pa.binary()),
        }
    )
    out = phash_media(rd.from_arrow(tbl)).to_pandas().set_index("media_ref")
    assert bool(out.loc["ok", "phash_ok"]) is True
    assert bool(out.loc["bad", "phash_ok"]) is False


def test_plant_near_dup_payloads_pipeline(ray_session):
    """synthesize -> plant -> pairs: every planted '#dup' twin pairs with
    its base ref at hamming 0 (lossless BMP re-encode of the same raster),
    and no un-planted pair appears."""
    from unsupervised_ner_ray.stages.multimodal import (
        phash_image_pairs,
        plant_near_dup_payloads,
        synthesize_payloads,
    )

    rd = _rd()
    media = rd.from_items(
        [
            {"doc_id": f"d{i}", "span_idx": 0, "kind": "image", "media_ref": f"media://img/{i}"}
            for i in range(24)
        ]
    )
    planted = plant_near_dup_payloads(synthesize_payloads(media), every=3)
    refs = planted.to_pandas()["media_ref"].tolist()
    dups = [r for r in refs if r.endswith("#dup")]
    assert dups, "expected at least one planted twin at every=3 over 24 refs"
    pairs = phash_image_pairs(planted, max_hamming=3, num_parts=4).to_pandas()
    got = {tuple(sorted((a, b))) for a, b, _ in pairs.itertuples(index=False)}
    want = {tuple(sorted((d[: -len("#dup")], d))) for d in dups}
    assert want <= got, want - got
    # GIF containers palette-quantize (median-cut, lossy): a base raster
    # that synthesized as GIF may legitimately hash a few bits from its
    # lossless twin yet still land inside max_hamming; but NO pair of
    # DISTINCT rasters may appear
    for a, b in got:
        assert b == a + "#dup", (a, b)


# ---------------------------------------------------------------------------
# k-core


def test_k_core_hand_graphs(ray_session):
    """K4 + pendant tail: 3-core = the K4 (core_deg 3 each); path graph
    peels to nothing at k=2 (cascade); triangle's 2-core is itself."""
    from unsupervised_ner_ray.stages.kg import k_core

    rd = _rd()
    k4 = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1 :]]
    edges = rd.from_items(
        [{"s": s, "o": o} for s, o in k4] + [{"s": "d", "o": "tail"}]
    )
    out = k_core(edges, k=3, num_parts=4).to_pandas()
    assert list(out["node"]) == ["a", "b", "c", "d"]
    assert list(out["core_deg"]) == [3, 3, 3, 3]

    path = rd.from_items(
        [{"s": "p1", "o": "p2"}, {"s": "p2", "o": "p3"}, {"s": "p3", "o": "p4"}]
    )
    assert len(k_core(path, k=2, num_parts=4).to_pandas()) == 0

    tri = rd.from_items(
        [{"s": "a", "o": "b"}, {"s": "b", "o": "c"}, {"s": "c", "o": "a"}]
    )
    out2 = k_core(tri, k=2, num_parts=4).to_pandas()
    assert list(out2["node"]) == ["a", "b", "c"]
    assert list(out2["core_deg"]) == [2, 2, 2]


def test_k_core_input_contract(ray_session):
    """Per-occurrence duplicate edges and self-loops do not change the
    result (same input contract as label_propagation)."""
    from unsupervised_ner_ray.stages.kg import k_core

    rd = _rd()
    tri = [{"s": "a", "o": "b"}, {"s": "b", "o": "c"}, {"s": "c", "o": "a"}]
    dirty = tri * 3 + [{"s": "a", "o": "a"}, {"s": "b", "o": "a"}]
    out_clean = k_core(rd.from_items(tri), k=2, num_parts=4).to_pandas()
    out_dirty = k_core(rd.from_items(dirty), k=2, num_parts=4).to_pandas()
    assert out_clean.reset_index(drop=True).equals(out_dirty.reset_index(drop=True))


def test_k_core_forced_distributed_equals_broadcast(ray_session):
    """broadcast_threshold=0 forces the Dataset-resident delta-peel regime
    (removed-delta drops via broadcast map filter); results are byte-equal
    to the driver-resident regime on a 4-iteration cascading graph."""
    from unsupervised_ner_ray.stages.kg import k_core

    rd = _rd()
    rng = np.random.RandomState(3)
    # two planted K5 cliques + random sparse background + pendant chains
    edges = []
    for base in ("u", "v"):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append({"s": f"{base}{i}", "o": f"{base}{j}"})
    for i in range(40):
        edges.append({"s": f"bg{rng.randint(20)}", "o": f"bg{rng.randint(20)}"})
    for i in range(6):
        edges.append({"s": f"u0", "o": f"chain{i}"})
    ds = rd.from_items(edges)
    small = k_core(ds, k=4, num_parts=4).to_pandas()
    dist = k_core(ds, k=4, broadcast_threshold=0, num_parts=4).to_pandas()
    assert small.reset_index(drop=True).equals(dist.reset_index(drop=True))
    # both K5s (and only nodes of core_deg >= 4) survive at k=4
    assert {f"u{i}" for i in range(5)} <= set(small["node"])
    assert {f"v{i}" for i in range(5)} <= set(small["node"])
    assert (small["core_deg"] >= 4).all()


def test_k_core_forced_antijoin_delta_path(ray_session):
    """removed_broadcast_threshold=0 additionally forces the worst-case
    co-partitioned anti-join drop path; byte-equal to the driver regime on
    a 2-iteration cascade (triangle + pendant chain into the K4)."""
    from unsupervised_ner_ray.stages.kg import k_core

    rd = _rd()
    k4 = [{"s": a, "o": b} for i, a in enumerate("abcd") for b in "abcd"[i + 1 :]]
    ds = rd.from_items(k4 + [{"s": "d", "o": "p1"}, {"s": "p1", "o": "p2"}])
    small = k_core(ds, k=3, num_parts=4).to_pandas()
    anti = k_core(
        ds, k=3, broadcast_threshold=0, removed_broadcast_threshold=0, num_parts=4
    ).to_pandas()
    assert small.reset_index(drop=True).equals(anti.reset_index(drop=True))
    assert list(small["node"]) == ["a", "b", "c", "d"]
    assert list(small["core_deg"]) == [3, 3, 3, 3]


@pytest.mark.skipif(
    __import__("os").environ.get("RUN_SCALE_SMOKE") != "1",
    reason="k-core smoke; run with RUN_SCALE_SMOKE=1 "
    "(result recorded in BASELINE.md)",
)
def test_k_core_distributed_scale_smoke(ray_session):
    """~850k-edge graph through the FORCED at-scale delta-peel regime
    (broadcast_threshold=0; removed-delta drops via the broadcast map
    path).  The 5-core is known EXACTLY by construction: 30k planted K6
    cliques (every node degree 5) survive; the background is a 200k-node
    ring + fixed-stride chord graph where every node has degree exactly 4
    (2 ring + 2 chord neighbors), so the whole background peels in one
    iteration — no probabilistic emergence argument needed."""
    import time

    rd = _rd()
    from unsupervised_ner_ray.stages.kg import k_core

    n_cliques, nb = 30_000, 200_000
    # K6 cliques: 15 edges each
    ci = np.repeat(np.arange(n_cliques, dtype=np.int64), 15)
    pairs = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    pa_ = np.tile(np.array([p[0] for p in pairs], dtype=np.int64), n_cliques)
    pb_ = np.tile(np.array([p[1] for p in pairs], dtype=np.int64), n_cliques)
    cs = np.char.add(np.char.add("c", ci.astype("U6")), np.char.add("_", pa_.astype("U1")))
    co = np.char.add(np.char.add("c", ci.astype("U6")), np.char.add("_", pb_.astype("U1")))
    # background: ring + stride-7919 chords -> every node degree exactly 4
    i = np.arange(nb, dtype=np.int64)
    ring_s, ring_o = i, (i + 1) % nb
    chord_s, chord_o = i, (i + 7919) % nb
    bs = np.char.add("b", np.concatenate([ring_s, chord_s]).astype("U6"))
    bo = np.char.add("b", np.concatenate([ring_o, chord_o]).astype("U6"))
    edges = (
        rd.from_pandas(
            pd.DataFrame(
                {"s": np.concatenate([cs, bs]), "o": np.concatenate([co, bo])}
            )
        )
        .repartition(32)
        .materialize()
    )
    n_edges = edges.count()
    assert n_edges == n_cliques * 15 + 2 * nb

    t0 = time.time()
    core = k_core(edges, k=5, broadcast_threshold=0).to_pandas()
    t_core = time.time() - t0
    assert len(core) == n_cliques * 6, len(core)
    assert (core["core_deg"] == 5).all()
    assert core["node"].str.startswith("c").all()
    print(
        f"SMOKE k_core edges={n_edges} forced-distributed delta-peel "
        f"{t_core:.1f}s core_nodes={len(core)}"
    )


# ---------------------------------------------------------------------------
# co-occurrence projection + node Jaccard


def test_cooccurrence_edges_hand_case(ray_session):
    """Hand-computed projection: weight counts DISTINCT groups sharing the
    pair; duplicate (group, item) rows collapse; singleton groups emit no
    edge."""
    rd = _rd()
    from unsupervised_ner_ray.stages.kg import cooccurrence_edges

    rows = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2, 2, 3, 3, 4],
            "i": [10, 20, 20, 10, 20, 30, 10, 20, 99],
        }
    )
    out = (
        cooccurrence_edges(rd.from_pandas(rows), "g", "i", num_parts=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        {
            "a": [10, 10, 20],
            "b": [20, 30, 30],
            "weight": [3, 1, 1],
        }
    ).astype({"a": "int64", "b": "int64", "weight": "int64"})
    assert out.equals(expect), out


def test_node_jaccard_hand_case(ray_session):
    """4-node path 1-2-3-4: N(1)={2}, N(3)={2,4} -> pair (1,3) via 2 has
    inter 1, union {2,4} -> J = 1/2; symmetrically (2,4) via 3 -> 1/2."""
    rd = _rd()
    from unsupervised_ner_ray.stages.kg import node_jaccard

    edges = rd.from_pandas(
        pd.DataFrame({"a": [1, 2, 3], "b": [2, 3, 4]})
    )
    out = (
        node_jaccard(edges, tau_pct=10, num_parts=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert list(out["a"]) == [1, 2]
    assert list(out["b"]) == [3, 4]
    assert list(out["inter"]) == [1, 1]
    assert list(out["un"]) == [2, 2]
    assert np.allclose(out["jaccard"], 1 / 2)
    # tau above 1/2 filters both
    hi = node_jaccard(edges, tau_pct=60, num_parts=4).to_pandas()
    assert len(hi) == 0


def test_node_jaccard_input_contract_and_strings(ray_session):
    """Duplicate edges, reversed duplicates, and self-loops collapse inside
    the operator; string node ids work end-to-end."""
    rd = _rd()
    from unsupervised_ner_ray.stages.kg import node_jaccard

    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "a": ["x", "y", "x", "y", "z", "w"],
                "b": ["y", "x", "x", "z", "y", "w"],
            }
        )
    )
    # simple graph: x-y, y-z; pair (x, z) via y -> N(x)=N(z)={y} -> J=1
    out = node_jaccard(edges, tau_pct=10, num_parts=4).to_pandas()
    assert len(out) == 1
    assert (out["a"].iloc[0], out["b"].iloc[0]) == ("x", "z")
    assert out["inter"].iloc[0] == 1 and out["un"].iloc[0] == 1
    assert out["jaccard"].iloc[0] == 1.0


def test_node_jaccard_forced_distributed_attach(ray_session):
    """broadcast_max_nodes=0 forces the tagged-union co-partitioned degree
    attach; results pinned byte-equal to the broadcast regime."""
    rd = _rd()
    from unsupervised_ner_ray.stages.kg import node_jaccard

    rng = np.random.RandomState(11)
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "a": rng.randint(0, 60, 400).astype(np.int64),
                "b": rng.randint(0, 60, 400).astype(np.int64),
            }
        )
    ).materialize()
    bc = (
        node_jaccard(edges, tau_pct=5, num_parts=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    dist = (
        node_jaccard(edges, tau_pct=5, broadcast_max_nodes=0, num_parts=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )[list(bc.columns)]
    assert len(bc) > 0
    assert dist.equals(bc)
    # csr_max_edges=0 forces the packed-key shuffle kernel (regime 2) in
    # its broadcast-degrees flavor; pinned equal to the CSR kernel too
    shuf = (
        node_jaccard(edges, tau_pct=5, csr_max_edges=0, num_parts=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )[list(bc.columns)]
    assert shuf.equals(bc)


def test_node_jaccard_hub_gate_removal_semantics(ray_session):
    """max_deg REMOVES hub nodes before pair generation (degrees recomputed
    on the filtered graph) — equal to running on the hand-filtered edge
    list."""
    rd = _rd()
    from unsupervised_ner_ray.stages.kg import node_jaccard

    # star hub 0 -- 1..9, plus a path 1-2-3
    star = pd.DataFrame({"a": [0] * 9 + [1, 2], "b": list(range(1, 10)) + [2, 3]})
    edges = rd.from_pandas(star.astype({"a": "int64", "b": "int64"}))
    gated = (
        node_jaccard(edges, tau_pct=10, max_deg=5, num_parts=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # hand-filtered: hub 0 removed -> remaining graph is the path 1-2-3
    manual = (
        node_jaccard(
            rd.from_pandas(
                pd.DataFrame({"a": [1, 2], "b": [2, 3]}).astype("int64")
            ),
            tau_pct=10,
            num_parts=4,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert gated.equals(manual)
    assert list(gated["a"]) == [1] and list(gated["b"]) == [3]


@pytest.mark.skipif(
    __import__("os").environ.get("RUN_SCALE_SMOKE") != "1",
    reason="node_jaccard smoke; run with RUN_SCALE_SMOKE=1 "
    "(result recorded in BASELINE.md)",
)
def test_node_jaccard_distributed_scale_smoke(ray_session):
    """~10⁶-edge graph through the FORCED at-scale degree attach
    (broadcast_max_nodes=0 — tagged-union co-partitioned merge on both
    sides).  The J >= 0.9 answer is known EXACTLY by construction:
    10k twin pairs (u_t, v_t) each wired to the same 10 private shared
    neighbors -> J(u,v) = 1.0, and every shared-neighbor pair within a
    twin group has N = {u, v} -> J = 1.0 (45 such pairs per group); the
    background is a 400k-node ring + fixed-stride chord graph where any
    two nodes share at most 1 of their 4 neighbors -> J <= 1/7."""
    import time

    rd = _rd()
    from unsupervised_ner_ray.stages.kg import node_jaccard

    T, S, nb = 10_000, 10, 400_000
    t_idx = np.repeat(np.arange(T, dtype=np.int64), S)
    s_idx = np.tile(np.arange(S, dtype=np.int64), T)
    sname = np.char.add(
        np.char.add("s", t_idx.astype("U6")), np.char.add("_", s_idx.astype("U2"))
    )
    uname = np.char.add("u", t_idx.astype("U6"))
    vname = np.char.add("v", t_idx.astype("U6"))
    i = np.arange(nb, dtype=np.int64)
    ring_s = np.char.add("b", i.astype("U6"))
    ring_o = np.char.add("b", ((i + 1) % nb).astype("U6"))
    chord_o = np.char.add("b", ((i + 7919) % nb).astype("U6"))
    edges = (
        rd.from_pandas(
            pd.DataFrame(
                {
                    "a": np.concatenate([uname, vname, ring_s, ring_s]),
                    "b": np.concatenate([sname, sname, ring_o, chord_o]),
                }
            )
        )
        .repartition(32)
        .materialize()
    )
    n_edges = edges.count()
    assert n_edges == 2 * T * S + 2 * nb

    t0 = time.time()
    out = node_jaccard(
        edges, tau_pct=90, broadcast_max_nodes=0
    ).to_pandas()
    t_j = time.time() - t0
    expected = T + T * (S * (S - 1) // 2)
    assert len(out) == expected, (len(out), expected)
    assert (out["jaccard"] == 1.0).all()
    uv = out[out["a"].str.startswith("u")]
    assert len(uv) == T
    assert (uv["inter"] == S).all() and (uv["un"] == S).all()
    print(
        f"SMOKE node_jaccard edges={n_edges} forced-distributed attach "
        f"{t_j:.1f}s pairs={len(out)}"
    )


# ---------------------------------------------------------------------------
# link-prediction indices (CN / Adamic-Adar / Resource Allocation)


def _lp_reference(edge_set, min_cn=1, hub=None):
    """Pure-python CN/AA/RA over an undirected simple graph, nanounit
    quantization identical to the operator contract."""
    import itertools
    import math
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edge_set:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for z, nb in adj.items():
        d = len(nb)
        if hub is not None and d > hub:
            continue
        w_aa = math.floor(1e9 / math.log(max(d, 2)))
        w_ra = math.floor(1e9 / max(d, 2))
        for x, y in itertools.combinations(sorted(nb), 2):
            cn, aa, ra = out.get((x, y), (0, 0, 0))
            out[(x, y)] = (cn + 1, aa + w_aa, ra + w_ra)
    return {k: v for k, v in out.items() if v[0] >= min_cn}


def _lp_random_graph(seed=7, n=40, m=120):
    import random

    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.sample(range(n), 2)
        edges.add((min(a, b), max(a, b)))
    return edges


def test_link_prediction_reference_parity(ray_session):
    """Random graph with dirty input (dups, reversed dups, self-loop):
    operator == pure-python reference for every (min_cn, hub, num_parts)
    combination; float columns are exactly nano/1e9."""
    import random

    from unsupervised_ner_ray.stages.kg import link_prediction_scores

    edges = _lp_random_graph()
    rng = random.Random(3)
    rows = []
    for a, b in edges:
        rows.append((a, b))
        if rng.random() < 0.3:
            rows.append((b, a))
        if rng.random() < 0.2:
            rows.append((a, b))
    rows.append((5, 5))
    df = pd.DataFrame(rows, columns=["a", "b"])
    for min_cn, hub, nparts in [(1, None, 1), (1, None, 7), (2, None, 8), (1, 4, 8)]:
        got = link_prediction_scores(
            _rd().from_pandas(df),
            min_cn=min_cn,
            max_shared_deg=hub,
            num_parts=nparts,
        ).to_pandas()
        exp = _lp_reference(edges, min_cn, hub)
        gd = {
            (int(r.a), int(r.b)): (int(r.cn), int(r.aa_nano), int(r.ra_nano))
            for r in got.itertuples()
        }
        assert gd == exp, (min_cn, hub, nparts)
        assert np.all(
            got["aa"].to_numpy()
            == got["aa_nano"].to_numpy().astype(np.float64) / 1e9
        )
        assert np.all(
            got["ra"].to_numpy()
            == got["ra_nano"].to_numpy().astype(np.float64) / 1e9
        )


def test_link_prediction_hand_case(ray_session):
    """Square a-b-c-d-a: opposite corners share exactly the two adjacent
    corners (deg 2 each) -> cn=2, aa_nano=2*floor(1e9/ln 2),
    ra_nano=2*floor(1e9/2); adjacent corners share nothing."""
    import math

    from unsupervised_ner_ray.stages.kg import link_prediction_scores

    df = pd.DataFrame({"a": [0, 1, 2, 3], "b": [1, 2, 3, 0]})
    got = (
        link_prediction_scores(_rd().from_pandas(df), num_parts=3)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    w = math.floor(1e9 / math.log(2))
    assert list(map(tuple, got[["a", "b", "cn"]].to_numpy())) == [
        (0, 2, 2),
        (1, 3, 2),
    ]
    assert (got["aa_nano"] == 2 * w).all()
    assert (got["ra_nano"] == 2 * 500_000_000).all()


def test_link_prediction_nanounit_duckdb_parity():
    """The quantization floor(1e9/ln d) / floor(1e9/d) is bit-identical
    between numpy and DuckDB over the full realistic degree range — the
    premise that makes the int64 sums oracle-exact."""
    import duckdb

    s = np.arange(2, 200_001, dtype=np.float64)
    np_aa = np.floor(1e9 / np.log(s)).astype(np.int64)
    np_ra = np.floor(1e9 / s).astype(np.int64)
    con = duckdb.connect()
    db = con.execute(
        "SELECT CAST(FLOOR(1000000000.0 / LN(s)) AS BIGINT) aa,"
        "       CAST(FLOOR(1000000000.0 / s) AS BIGINT) ra "
        "FROM range(2, 200001) r(s) ORDER BY s"
    ).fetchnumpy()
    con.close()
    assert np.array_equal(np_aa, db["aa"])
    assert np.array_equal(np_ra, db["ra"])


def test_link_prediction_string_nodes(ray_session):
    """String node ids ride the generic frame path unchanged."""
    from unsupervised_ner_ray.stages.kg import link_prediction_scores

    df = pd.DataFrame(
        {"a": ["x", "x", "y"], "b": ["hub", "y", "hub"]}
    )  # triangle x-y-hub
    got = link_prediction_scores(
        _rd().from_pandas(df), num_parts=2
    ).to_pandas()
    gd = {
        (r.a, r.b): int(r.cn) for r in got.itertuples()
    }
    # each pair shares exactly the third node
    assert gd == {("hub", "x"): 1, ("hub", "y"): 1, ("x", "y"): 1}


# ---------------------------------------------------------------------------
# HITS hubs/authorities


def _hits_numpy(edge_set, iters):
    """Dense numpy HITS (Gauss-Seidel ordering, L2 norms) over the distinct
    simple digraph."""
    nodes = sorted({x for e in edge_set for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, o in edge_set:
        A[idx[s], idx[o]] = 1.0
    h = np.full(len(nodes), 1.0 / np.sqrt(len(nodes)))
    a = np.zeros(len(nodes))
    for _ in range(iters):
        a = A.T @ h
        nrm = np.linalg.norm(a)
        a = a / nrm if nrm > 0 else a
        h = A @ a
        nrm = np.linalg.norm(h)
        h = h / nrm if nrm > 0 else h
    return {str(v): (h[idx[v]], a[idx[v]]) for v in nodes}


def _hits_random_digraph(seed=11, n=25, m=80):
    import random

    rng = random.Random(seed)
    E = set()
    while len(E) < m:
        s, o = rng.sample(range(n), 2)
        E.add((s, o))
    return E


def test_hits_numpy_parity_broadcast(ray_session):
    """Broadcast regime == dense numpy HITS on a random digraph with dirty
    input (self-loop + duplicate edges)."""
    from unsupervised_ner_ray.stages.kg import hits

    E = _hits_random_digraph()
    rows = list(E) + [(3, 3), (1, 2), (1, 2)]
    df = pd.DataFrame(rows, columns=["s", "o"])
    got = hits(_rd().from_pandas(df), iters=30).to_pandas()
    ref = _hits_numpy(set((s, o) for s, o in rows if s != o), 30)
    assert set(got["node_id"]) == set(ref)
    for r in got.itertuples():
        eh, ea = ref[r.node_id]
        assert abs(r.hub - eh) < 1e-9 and abs(r.auth - ea) < 1e-9, r.node_id


def test_hits_forced_shuffle_regime_equals_numpy(ray_session):
    """broadcast_threshold=0 forces the at-scale Dataset-vector regime;
    few iterations keep the per-iteration shuffle count test-sized."""
    from unsupervised_ner_ray.stages.kg import hits

    E = _hits_random_digraph(seed=5, n=15, m=40)
    df = pd.DataFrame(sorted(E), columns=["s", "o"])
    got = hits(
        _rd().from_pandas(df), iters=2, broadcast_threshold=0
    ).to_pandas()
    ref = _hits_numpy(E, 2)
    assert set(got["node_id"]) == set(ref)
    for r in got.itertuples():
        eh, ea = ref[r.node_id]
        assert abs(r.hub - eh) < 1e-12 and abs(r.auth - ea) < 1e-12, r.node_id


def test_hits_hand_case_and_sink_source(ray_session):
    """Star into z: every source is a pure hub (auth 0), z a pure
    authority (hub 0); hubs tie at 1/sqrt(3), z's authority is 1."""
    from unsupervised_ner_ray.stages.kg import hits

    df = pd.DataFrame({"s": ["a", "b", "c"], "o": ["z", "z", "z"]})
    got = hits(_rd().from_pandas(df), iters=5).to_pandas().set_index("node_id")
    assert abs(got.loc["z", "auth"] - 1.0) < 1e-12
    assert got.loc["z", "hub"] == 0.0
    for v in "abc":
        assert abs(got.loc[v, "hub"] - 1.0 / np.sqrt(3)) < 1e-12
        assert got.loc[v, "auth"] == 0.0


# ---------------------------------------------------------------------------
# audio fingerprint (perceptual hash over PCM WAV)


def test_ahash64_invariances():
    """Lossless WAV re-encode hashes identically; -40 dB noise + 0.5x
    volume moves at most a few bits; distinct tones are far apart."""
    from unsupervised_ner_ray.functions import media_codecs as mc
    from unsupervised_ner_ray.stages.multimodal import ahash64

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    rng = np.random.RandomState(4)
    hashes = []
    for i in range(20):
        t = np.arange(1600 + i * 37)
        s = (
            np.sin(2 * np.pi * (110 + i * 13.7) * t / 16000.0) * 12000
        ).astype(np.int16)
        h = ahash64(s, 16000)
        s2, r2 = mc.decode_wav(mc.encode_wav(s, 16000))
        assert ahash64(s2, r2) == h
        noisy = np.clip(
            s * 0.5 + rng.randint(-60, 61, s.shape), -32768, 32767
        ).astype(np.int16)
        assert ham(ahash64(noisy, 16000), h) <= 2
        hashes.append(h)
    cross = [
        ham(hashes[i], hashes[j])
        for i in range(20)
        for j in range(i + 1, 20)
    ]
    assert min(cross) >= 3 and sorted(cross)[len(cross) // 2] >= 20


def test_audio_fingerprint_planted_pairs(ray_session):
    """End-to-end: synthesize WAV payloads -> plant noisy volume-scaled
    twins -> every planted (ref, ref#dup) pair comes back."""
    import ray.data as rd

    from unsupervised_ner_ray.stages.multimodal import (
        audio_fingerprint_pairs,
        plant_audio_dup_payloads,
        synthesize_payloads,
    )

    media = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [f"d{i}" for i in range(30)],
                "span_idx": np.zeros(30, dtype=np.int32),
                "kind": ["audio"] * 30,
                "media_ref": [f"aud://{i:03d}" for i in range(30)],
            }
        )
    )
    planted = plant_audio_dup_payloads(
        synthesize_payloads(media), every=3, noise=50, gain=0.6
    )
    n_twins = sum(1 for r in planted.to_pandas()["media_ref"] if r.endswith("#dup"))
    assert n_twins > 0
    pairs = audio_fingerprint_pairs(planted, max_hamming=2).to_pandas()
    got = {(r.a, r.b) for r in pairs.itertuples()}
    for a, b in got:
        assert a < b
    planted_pairs = {
        (r[: -len("#dup")], r)
        for r in planted.to_pandas()["media_ref"]
        if r.endswith("#dup")
    }
    missing = planted_pairs - got
    assert not missing, missing


def test_ahasher_quarantines_corrupt_payload(ray_session):
    """A truncated WAV buffer degrades to ahash_ok=false, never a
    poisoned batch."""
    import ray.data as rd

    from unsupervised_ner_ray.functions import media_codecs as mc
    from unsupervised_ner_ray.stages.multimodal import ahash_media

    good = mc.encode_wav(
        (np.sin(np.arange(2000) * 0.05) * 9000).astype(np.int16), 16000
    )
    df = pd.DataFrame(
        {
            "kind": ["audio", "audio"],
            "media_ref": ["ok", "bad"],
            "payload": [good, good[:11]],
        }
    )
    out = ahash_media(rd.from_pandas(df), concurrency=1).to_pandas()
    out = out.set_index("media_ref")
    assert bool(out.loc["ok", "ahash_ok"]) is True
    assert bool(out.loc["bad", "ahash_ok"]) is False


def test_link_prediction_forced_generic_equals_csr(ray_session):
    """csr_max_edges=0 forces the partitioned frame path; both kernels
    must emit identical rows on the same dirty random graph."""
    from unsupervised_ner_ray.stages.kg import link_prediction_scores

    edges = _lp_random_graph(seed=13, n=30, m=90)
    df = pd.DataFrame(sorted(edges), columns=["a", "b"])

    def rows(res):
        return {
            (int(r.a), int(r.b)): (int(r.cn), int(r.aa_nano), int(r.ra_nano))
            for r in res.itertuples()
        }

    csr = rows(
        link_prediction_scores(_rd().from_pandas(df), min_cn=2).to_pandas()
    )
    gen = rows(
        link_prediction_scores(
            _rd().from_pandas(df), min_cn=2, csr_max_edges=0
        ).to_pandas()
    )
    assert csr == gen and len(csr) > 0
    # hub gate rides both kernels identically
    csr_h = rows(
        link_prediction_scores(
            _rd().from_pandas(df), max_shared_deg=5
        ).to_pandas()
    )
    gen_h = rows(
        link_prediction_scores(
            _rd().from_pandas(df), max_shared_deg=5, csr_max_edges=0
        ).to_pandas()
    )
    assert csr_h == gen_h


# ---------------------------------------------------------------------------
# video fingerprint (frame-pHash majority fold)


def test_vhash64_reencode_invariance_and_separation():
    """MJPEG re-encode of the same frames hashes identically; unrelated
    clips are far apart; empty frame list rejected."""
    from unsupervised_ner_ray.functions import media_codecs as mc
    from unsupervised_ner_ray.stages.multimodal import vhash64

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    rng = np.random.RandomState(5)
    hashes = []
    for i in range(10):
        base = rng.randint(0, 200, (24 + i, 30 + i, 3)).astype(np.int64)
        frames = [
            np.clip(base + 10 * k, 0, 255).astype(np.uint8)
            for k in range(3 + i % 4)
        ]
        dec, fps = mc.decode_avi_mjpeg(mc.encode_avi_mjpeg(frames, fps=5))
        hv = vhash64(dec)
        dec2, _ = mc.decode_avi_mjpeg(mc.encode_avi_mjpeg(dec, fps=5))
        assert ham(vhash64(dec2), hv) <= 1
        hashes.append(hv)
    cross = [
        ham(hashes[i], hashes[j])
        for i in range(10)
        for j in range(i + 1, 10)
    ]
    assert min(cross) >= 8
    with pytest.raises(ValueError):
        vhash64([])


def test_video_fingerprint_planted_pairs(ray_session):
    """End-to-end: synthesize AVI payloads -> plant re-encode twins ->
    every planted (ref, ref#dup) pair comes back; corrupt payloads
    quarantine."""
    import ray.data as rd

    from unsupervised_ner_ray.stages.multimodal import (
        plant_video_dup_payloads,
        synthesize_payloads,
        vhash_media,
        video_fingerprint_pairs,
    )

    media = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [f"d{i}" for i in range(18)],
                "span_idx": np.zeros(18, dtype=np.int32),
                "kind": ["video"] * 18,
                "media_ref": [f"vid://{i:03d}" for i in range(18)],
            }
        )
    )
    planted = plant_video_dup_payloads(synthesize_payloads(media), every=3)
    pdf = planted.to_pandas()
    twins = {r for r in pdf["media_ref"] if r.endswith("#dup")}
    assert twins
    pairs = video_fingerprint_pairs(planted, max_hamming=3).to_pandas()
    got = {(r.a, r.b) for r in pairs.itertuples()}
    for t in twins:
        assert (t[: -len("#dup")], t) in got, t
    # corrupt payload quarantine
    bad = pd.DataFrame(
        {
            "kind": ["video"],
            "media_ref": ["bad"],
            "payload": [pdf["payload"].iloc[0][:13]],
        }
    )
    out = vhash_media(rd.from_pandas(bad), concurrency=1).to_pandas()
    assert bool(out["vhash_ok"].iloc[0]) is False


@pytest.mark.skipif(
    __import__("os").environ.get("RUN_SCALE_SMOKE") != "1",
    reason="RUN_SCALE_SMOKE=1 (result recorded in BASELINE.md)",
)
def test_audio_fingerprint_scale_smoke(ray_session):
    """10k synthesized WAV rows + noisy volume-scaled twins: full planted
    recall through the actor-pool decode + band LSH, bucket work stays
    bucket-local (no all-pairs)."""
    import time

    import ray.data as rd

    from unsupervised_ner_ray.stages.multimodal import (
        audio_fingerprint_pairs,
        plant_audio_dup_payloads,
        synthesize_payloads,
    )

    n = 10_000
    media = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [f"d{i}" for i in range(n)],
                "span_idx": np.zeros(n, dtype=np.int32),
                "kind": ["audio"] * n,
                "media_ref": [f"aud://{i:05d}" for i in range(n)],
            }
        )
    )
    t0 = time.time()
    planted = plant_audio_dup_payloads(
        synthesize_payloads(media), every=8, noise=50, gain=0.6
    ).materialize()
    twins = {
        r for r in planted.to_pandas()["media_ref"] if r.endswith("#dup")
    }
    pairs = audio_fingerprint_pairs(planted, max_hamming=2).to_pandas()
    secs = time.time() - t0
    got = {(r.a, r.b) for r in pairs.itertuples()}
    missing = {
        (t[: -len("#dup")], t) for t in twins
    } - got
    assert not missing, (len(missing), len(twins))
    print(
        f"SMOKE audio_fingerprint 10k+{len(twins)} twins: {secs:.1f}s, "
        f"{len(got)} pairs, full planted recall"
    )


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (Lee et al. 2022 style, token-level)


def test_duplicated_spans_hand_case():
    """Planted corpus: docs 1 and 2 share one exact 10-token run (-> one
    maximal span each, 3 duplicated 8-windows merged), doc 3 repeats an
    8-token run INTERNALLY at positions 0 and 20 (gap 20 > W=8 -> two
    separate spans in the same doc), doc 4 is unique text, doc 5 is shorter
    than the window. Token indices are inclusive."""
    from unsupervised_ner_ray.stages.dedup import duplicated_spans

    shared = " ".join(f"s{i}" for i in range(10))  # 10 shared tokens
    rep8 = " ".join(f"r{i}" for i in range(8))  # 8-token internal repeat
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                shared + " ux1 ux2",  # span tokens 0..9
                "vy1 vy2 vy3 " + shared,  # span tokens 3..12
                # rep8 at pos 0, 12 unique tokens, rep8 again at pos 20
                rep8 + " " + " ".join(f"m{i}" for i in range(12)) + " " + rep8,
                " ".join(f"u{i}" for i in range(30)),
                "a b c",
            ],
        }
    )
    out = (
        duplicated_spans(_rd().from_pandas(docs), window_tokens=8)
        .to_pandas()
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 3],
            "span_start": [0, 3, 0, 20],
            "span_end": [9, 12, 7, 27],
            "n_windows": [3, 3, 1, 1],
        }
    ).astype("int64")
    pd.testing.assert_frame_equal(out.astype("int64"), expect)


def test_duplicated_spans_touching_windows_merge():
    """Two duplicated windows whose spans touch (start gap == W) merge into
    ONE maximal span; gap == W+1 leaves two."""
    from unsupervised_ner_ray.stages.dedup import duplicated_spans

    w = 4

    def corpus(gap_tokens):
        a = " ".join(f"a{i}" for i in range(w))
        b = " ".join(f"b{i}" for i in range(w))
        mid = " ".join(f"x{i}" for i in range(gap_tokens))
        body = (a + " " + mid + " " + b) if gap_tokens else (a + " " + b)
        return pd.DataFrame(
            {"doc_id": [1, 2], "text": [body, a + " zz1 zz2 zz3 zz4 " + b]}
        )

    # doc1: a at 0, b at w (touching) -> one span 0..2w-1
    out = (
        duplicated_spans(_rd().from_pandas(corpus(0)), window_tokens=w)
        .to_pandas()
    )
    d1 = out[out["doc_id"] == 1]
    assert list(map(tuple, d1[["span_start", "span_end"]].to_numpy())) == [
        (0, 2 * w - 1)
    ]
    # gap of 1 unique token between them -> starts 0 and w+1 (> W) -> 2 spans
    out = (
        duplicated_spans(_rd().from_pandas(corpus(1)), window_tokens=w)
        .to_pandas()
    )
    d1 = out[out["doc_id"] == 1].sort_values("span_start")
    assert list(map(tuple, d1[["span_start", "span_end"]].to_numpy())) == [
        (0, w - 1),
        (w + 1, 2 * w),
    ]


def test_duplicated_spans_empty_and_clean():
    """All-unique corpus -> zero rows with the right schema; empty-text and
    sub-window docs never crash."""
    from unsupervised_ner_ray.stages.dedup import duplicated_spans

    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["q1 q2 q3 q4 q5", "", "z1 z2"]}
    )
    out = duplicated_spans(_rd().from_pandas(docs), window_tokens=3).to_pandas()
    assert len(out) == 0
    # an all-empty Ray groupby/map_groups drops the schema entirely; when
    # any partition survives the schema is the 4-column contract
    assert list(out.columns) in (
        [],
        ["doc_id", "span_start", "span_end", "n_windows"],
    )


# ---------------------------------------------------------------------------
# Count-Min sketch


def test_cms_one_sided_and_exact_on_sparse_vocab(ray_session):
    """CMS never underestimates; with a vocab tiny relative to width the
    top-token estimates are exact (no cell collisions on this corpus —
    asserted, not assumed, via the true counts carried alongside)."""
    from unsupervised_ner_ray.stages import textstats

    rd = _rd()
    docs = rd.from_items(
        [
            {"doc_id": f"d{i}", "text": ("alpha beta " * (i % 5 + 1)).strip() + " gamma"}
            for i in range(60)
        ]
    )
    out = textstats.cms_token_estimates(docs, k=3, width=4096, depth=4)
    assert list(out.columns) == ["token", "n_true", "n_est"]
    assert (out["n_est"] >= out["n_true"]).all()
    # alpha/beta: 12 * (1+2+3+4+5) = 180 each; gamma once per doc
    truth = {"alpha": 180, "beta": 180, "gamma": 60}
    got = dict(zip(out["token"], out["n_true"]))
    assert got == truth
    # 3 tokens in 4 x 4096 cells: estimates exact here
    assert (out["n_est"] == out["n_true"]).all()


def test_cms_batching_independence_and_bound(ray_session):
    """The sketch is a sum of per-batch partials: repartitioning cannot
    change a single estimate; the standard excess bound 2N/width holds for
    every query on an adversarially colliding (width=8) sketch."""
    from unsupervised_ner_ray.stages import textstats

    rd = _rd()
    rows = [
        {"doc_id": f"d{i}", "text": f"tok{i % 17} tok{i % 7} filler{i % 31}"}
        for i in range(200)
    ]
    docs = rd.from_items(rows)
    out1 = textstats.cms_token_estimates(docs, k=10, width=8, depth=4)
    out2 = textstats.cms_token_estimates(docs.repartition(9), k=10, width=8, depth=4)
    pd.testing.assert_frame_equal(out1, out2)
    # total tokens = 600; CMS guarantee: excess <= 2N/width w.p. 1-2^-depth
    # per query — on this fixed corpus just assert it outright
    n_total = 600
    assert ((out1["n_est"] - out1["n_true"]) <= 2 * n_total / 8).all()
    assert (out1["n_est"] >= out1["n_true"]).all()


def test_cms_estimate_kernel_matches_direct_count():
    """Driver-side kernel sanity: sketch built from one dense pass equals
    hand-accumulated counts for non-colliding tokens."""
    from unsupervised_ner_ray.stages.textstats import (
        _cms_cells,
        cms_estimate,
    )

    toks = pd.Series(["a", "b", "c"], dtype=object)
    width, depth = 1024, 4
    cells = _cms_cells(toks, width, depth)
    sketch = np.zeros((depth, width), dtype=np.int64)
    true = np.array([5, 7, 11], dtype=np.int64)
    for r in range(depth):
        np.add.at(sketch[r], cells[r], true)
    est = cms_estimate(sketch, list(toks))
    # no collisions among 3 tokens in 1024 cells for this fixed hash
    assert (est == true).all()


# ---------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG)


def test_string_agg_matches_duckdb(ray_session):
    """Engine LISTAGG == DuckDB ordered string_agg at sf0.001, and the
    result is independent of the coarse partition count."""
    import duckdb

    from unsupervised_ner_ray.stages import relational

    out = relational.q_string_agg_names("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/customer.parquet')"
    )
    oracle = con.execute(
        "SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS names "
        "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"
    ).fetchdf()
    a = out.assign(c_nationkey=out["c_nationkey"].astype("int64"))
    b = oracle.assign(c_nationkey=oracle["c_nationkey"].astype("int64"))
    pd.testing.assert_frame_equal(a, b)
    out3 = relational.q_string_agg_names(
        "/root/testdata/sf0.001", num_parts=3
    ).to_pandas()
    pd.testing.assert_frame_equal(out.reset_index(drop=True), out3.reset_index(drop=True))


# ---------------------------------------------------------------------------
# Incremental exact dedup (persisted state across loads)


def _inc_rows():
    # 30 docs, text repeats every 7 ids -> every hash seen in load 0
    # (ids 0,3,6..) except where the first occurrence falls in load 1/2
    return [{"doc_id": i, "text": f"text {i % 7}"} for i in range(30)]


def _inc_reference(rows, split_mod=3):
    import hashlib

    ref = pd.DataFrame(rows)
    ref["content_hash"] = [
        hashlib.md5(t.encode()).hexdigest() for t in ref["text"]
    ]
    ref["load"] = ref["doc_id"] % split_mod
    fl = ref.groupby("content_hash")["load"].min().rename("first_load")
    ref = ref.merge(fl, on="content_hash")
    return (
        ref[ref["load"] == ref["first_load"]]
        .groupby("content_hash")
        .agg(keep_id=("doc_id", "min"), first_load=("first_load", "first"))
        .reset_index()
        .sort_values("content_hash")
        .reset_index(drop=True)
        .astype({"keep_id": "int64", "first_load": "int64"})
    )


def test_incremental_dedup_matches_reference(ray_session, tmp_path):
    from unsupervised_ner_ray.stages.dedup import incremental_exact_dedup

    rd = _rd()
    rows = _inc_rows()
    out = (
        incremental_exact_dedup(
            rd.from_items(rows), str(tmp_path / "state"), split_mod=3
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"keep_id": "int64", "first_load": "int64"}),
        _inc_reference(rows),
    )


def test_incremental_dedup_resume_is_noop(ray_session, tmp_path):
    """Committed loads are skipped on re-run: identical result, no extra
    state files, manifest unchanged."""
    import glob
    import json

    from unsupervised_ner_ray.stages.dedup import incremental_exact_dedup

    rd = _rd()
    rows = _inc_rows()
    state = str(tmp_path / "state")
    out1 = incremental_exact_dedup(rd.from_items(rows), state, split_mod=3).to_pandas()
    files1 = sorted(glob.glob(f"{state}/part=*/load_*.parquet"))
    out2 = incremental_exact_dedup(rd.from_items(rows), state, split_mod=3).to_pandas()
    files2 = sorted(glob.glob(f"{state}/part=*/load_*.parquet"))
    pd.testing.assert_frame_equal(out1, out2)
    assert files1 == files2
    with open(f"{state}/_loads.json") as f:
        assert json.load(f) == [0, 1, 2]


def test_incremental_dedup_partial_state_resumes(ray_session, tmp_path):
    """A run that committed only load 0 (simulated kill: manifest truncated
    to [0]) finishes the remaining loads and converges to the full answer —
    and load 0's rows are not recomputed differently."""
    import json

    from unsupervised_ner_ray.stages.dedup import incremental_exact_dedup

    rd = _rd()
    rows = _inc_rows()
    state = str(tmp_path / "state")
    # full run, then roll the manifest back to load 0 only and delete the
    # later loads' files (what a kill between commits leaves behind)
    incremental_exact_dedup(rd.from_items(rows), state, split_mod=3).to_pandas()
    import glob
    import os

    for fp in glob.glob(f"{state}/part=*/load_[12].parquet"):
        os.remove(fp)
    with open(f"{state}/_loads.json", "w") as f:
        json.dump([0], f)
    out = (
        incremental_exact_dedup(rd.from_items(rows), state, split_mod=3)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"keep_id": "int64", "first_load": "int64"}),
        _inc_reference(rows),
    )


def test_incremental_dedup_cross_load_dup_dropped(ray_session, tmp_path):
    """A doc in a later load duplicating an earlier load's text never
    appears as a keeper."""
    from unsupervised_ner_ray.stages.dedup import incremental_exact_dedup

    rd = _rd()
    rows = [
        {"doc_id": 0, "text": "unique zero"},   # load 0
        {"doc_id": 3, "text": "shared text"},   # load 0 <- winner
        {"doc_id": 4, "text": "shared text"},   # load 1 dup of load 0
        {"doc_id": 7, "text": "only load one"}, # load 1
    ]
    out = (
        incremental_exact_dedup(
            rd.from_items(rows), str(tmp_path / "state"), split_mod=3
        )
        .to_pandas()
    )
    assert len(out) == 3
    assert 4 not in set(out["keep_id"])
    row = out[out["keep_id"] == 3].iloc[0]
    assert int(row["first_load"]) == 0


# ---------------------------------------------------------------------------
# PERCENTILE_CONT (interpolated quantiles)


def test_quantile_cont_bitexact_vs_duckdb(ray_session):
    """Random groups/values: the engine's floor/ceil selection +
    DuckDB-expression interpolation is BIT-exact vs quantile_cont (no
    rounding), including a q whose (n-1)*q double product exercises the
    inexact-decimal path (0.37)."""
    import duckdb

    from unsupervised_ner_ray.stages.relational import quantile_cont_by_group

    rd = _rd()
    rng = np.random.RandomState(1)
    df = pd.DataFrame(
        {"g": rng.choice(list("abc"), 500), "v": rng.uniform(0, 1e5, 500)}
    )
    got = (
        quantile_cont_by_group(rd.from_pandas(df), "g", "v", qs=(0.5, 0.9, 0.37))
        .to_pandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT g AS grp, quantile_cont(v,0.5) p50, quantile_cont(v,0.9) p90, "
        "quantile_cont(v,0.37) p37 FROM t GROUP BY g ORDER BY g"
    ).fetchdf()
    pcols = [c for c in got.columns if c not in ("grp", "n_rows")]
    assert (
        got[pcols].to_numpy() == want[["p50", "p90", "p37"]].to_numpy()
    ).all()


def test_quantile_cont_integral_rank_and_forced_multipass(ray_session):
    """(n-1)*q integral -> the exact element, no interpolation; and the
    result is identical when the refinement is forced through multiple
    passes (tiny buckets/threshold)."""
    import duckdb

    from unsupervised_ner_ray.stages.relational import quantile_cont_by_group

    rd = _rd()
    # n = 5 per group -> (n-1)*0.5 = 2 exactly
    df = pd.DataFrame({"g": ["a"] * 5, "v": [10.0, 20.0, 30.0, 40.0, 50.0]})
    got = quantile_cont_by_group(rd.from_pandas(df), "g", "v", qs=(0.5,)).to_pandas()
    assert got["p50"].iloc[0] == 30.0
    # forced multi-pass on a bigger column
    rng = np.random.RandomState(3)
    big = pd.DataFrame({"g": ["x"] * 4000, "v": rng.uniform(0, 1e6, 4000)})
    easy = quantile_cont_by_group(rd.from_pandas(big), "g", "v", qs=(0.9,)).to_pandas()
    hard = quantile_cont_by_group(
        rd.from_pandas(big), "g", "v", qs=(0.9,), num_buckets=16,
        collect_threshold=50,
    ).to_pandas()
    assert easy["p90"].iloc[0] == hard["p90"].iloc[0]
    con = duckdb.connect()
    con.register("t", big)
    want = con.execute("SELECT quantile_cont(v, 0.9) FROM t").fetchone()[0]
    assert easy["p90"].iloc[0] == want


# ---------------------------------------------------------------------------
# OHLC time-bucket resample


def test_ohlc_matches_duckdb_and_partition_independent(ray_session):
    import duckdb

    from unsupervised_ner_ray.stages.relational import q_ohlc_events

    out = q_ohlc_events("/root/testdata/sf0.001").to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    want = con.execute(
        """
        WITH b AS (
            SELECT event_type, date_trunc('hour', ts) AS bkt,
                   CAST(floor(value * 100) AS BIGINT) AS cents,
                   epoch_us(ts) - epoch_us(date_trunc('hour', ts)) AS off
            FROM events
        ), m AS (
            SELECT event_type, bkt, MIN(off*65536 + cents) AS op,
                   MAX(off*65536 + cents) AS cp, MIN(cents) AS low_cents,
                   MAX(cents) AS high_cents, COUNT(*) AS n_rows
            FROM b GROUP BY 1, 2
        )
        SELECT event_type, strftime(bkt, '%Y-%m-%d %H:00:00') AS bucket,
               CAST(op % 65536 AS BIGINT) AS open_cents,
               CAST(high_cents AS BIGINT) AS high_cents,
               CAST(low_cents AS BIGINT) AS low_cents,
               CAST(cp % 65536 AS BIGINT) AS close_cents,
               CAST(n_rows AS BIGINT) AS n_rows
        FROM m ORDER BY event_type, bucket
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(out, want)
    out3 = (
        q_ohlc_events("/root/testdata/sf0.001", num_parts=3)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out3)
    # OHLC invariants on every bucket
    assert (out["low_cents"] <= out["open_cents"]).all()
    assert (out["low_cents"] <= out["close_cents"]).all()
    assert (out["high_cents"] >= out["open_cents"]).all()
    assert (out["high_cents"] >= out["close_cents"]).all()


def test_ohlc_tie_rule_same_timestamp():
    """Two events in the same microsecond: open takes MIN cents, close MAX
    cents — the documented deterministic tie rule (packed-key semantics)."""
    import ray.data as rd

    from unsupervised_ner_ray.stages.relational import q_ohlc_events  # noqa: F401
    # exercise the packing kernel directly through a tiny synthetic table
    import pyarrow as pa

    ts = pd.to_datetime(
        ["2024-01-01 05:10:00.000001"] * 2 + ["2024-01-01 05:59:00.000000"],
        format="%Y-%m-%d %H:%M:%S.%f",
    )
    df = pd.DataFrame(
        {"event_type": ["x"] * 3, "ts": ts, "value": [2.00, 1.00, 5.00]}
    )
    import tempfile

    import pyarrow.parquet as pq_

    with tempfile.TemporaryDirectory() as d:
        pq_.write_table(
            pa.Table.from_pandas(df, preserve_index=False), f"{d}/events.parquet"
        )
        out = q_ohlc_events(d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # same-µs open tie -> min cents (100); close is the later event (500)
    assert int(r["open_cents"]) == 100
    assert int(r["close_cents"]) == 500
    assert int(r["low_cents"]) == 100 and int(r["high_cents"]) == 500


# ---------------------------------------------------------------------------
# MERGE / upsert apply


def test_merge_upsert_matches_duckdb_and_semantics(ray_session):
    import duckdb

    from unsupervised_ner_ray.stages.relational import q_merge_upsert

    out = q_merge_upsert("/root/testdata/sf0.001").to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/orders.parquet')"
    )
    want = con.execute(
        """
        WITH base AS (SELECT CAST(o_orderkey AS BIGINT) k,
                             CAST(floor(o_totalprice*100) AS BIGINT) cents
                      FROM orders),
        upd AS (SELECT k, cents + 100000 AS cents FROM base WHERE k % 10 = 3),
        del AS (SELECT k FROM base WHERE k % 10 = 7),
        ins AS (SELECT k + 1000000000 AS k, cents + 50 AS cents
                FROM base WHERE k % 10 = 1)
        SELECT k AS o_orderkey, cents, src FROM (
            SELECT b.k, COALESCE(u.cents, b.cents) AS cents,
                   CASE WHEN u.k IS NOT NULL THEN 'update' ELSE 'base' END AS src
            FROM base b LEFT JOIN upd u ON b.k = u.k
            WHERE b.k NOT IN (SELECT k FROM del)
            UNION ALL SELECT k, cents, 'insert' FROM ins
        ) ORDER BY o_orderkey
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(out, want)
    # semantics: no deleted key survives, every update bumped, inserts fresh
    assert not (out["o_orderkey"] % 10 == 7)[out["o_orderkey"] < 1_000_000_000].any()
    assert (out.loc[out["src"] == "insert", "o_orderkey"] >= 1_000_000_000).all()


# ---------------------------------------------------------------------------
# KMV theta-sketch set operations


def test_kmv_exact_below_k(ray_session):
    """Below k distinct values the sketch is the full hash set: every
    estimate (incl. intersection/union) is exact."""
    from unsupervised_ner_ray.stages.joins import kmv_set_estimates

    rd = _rd()
    a = rd.from_pandas(pd.DataFrame({"u": np.arange(300)}))
    b = rd.from_pandas(pd.DataFrame({"u": np.arange(200, 500)}))
    est = kmv_set_estimates(a, b, "u", k=1024)
    assert est["n_a"][0] == 300.0
    assert est["n_b"][0] == 300.0
    assert est["n_intersect"][0] == 100.0
    assert est["n_union"][0] == 500.0


def test_kmv_accuracy_and_determinism(ray_session):
    """k=4096 over 10k/13k sets with 5k overlap: every estimate within 5%
    (the 1/sqrt(k * inter/union) RSE bound; the fixed hash key makes the
    outcome deterministic, so this pins an observed value, not luck), and
    repartitioning cannot change a single digit (bottom-k merge is
    associative + idempotent)."""
    from unsupervised_ner_ray.stages.joins import kmv_set_estimates

    rd = _rd()
    a_df = pd.DataFrame({"u": np.arange(10000)})
    b_df = pd.DataFrame({"u": np.arange(5000, 18000)})
    est = kmv_set_estimates(
        rd.from_pandas(a_df), rd.from_pandas(b_df), "u", k=4096
    )
    true = {"n_a": 10000, "n_b": 13000, "n_intersect": 5000, "n_union": 18000}
    for c, t in true.items():
        assert abs(est[c][0] - t) / t < 0.05, (c, est[c][0])
    est2 = kmv_set_estimates(
        rd.from_pandas(a_df).repartition(7),
        rd.from_pandas(b_df).repartition(3),
        "u",
        k=4096,
    )
    pd.testing.assert_frame_equal(est, est2)
