"""random_walks: deterministic DeepWalk sampling over an undirected graph.

The determinism contract (blake2b-64 node hashes + splitmix64 mixing +
sorted-neighbor indexing) makes the walk a pure function of strings, so a
pure-python reference reproduces the engine bit-for-bit — in BOTH regimes.
"""

import sys

sys.path.insert(0, "/root/repo")

import hashlib

import pandas as pd
import pytest
import ray.data as rd

from unsupervised_ner_ray.stages.kg import random_walks

_M = (1 << 64) - 1
_C_R = 0x9E3779B97F4A7C15
_C_T = 0xC2B2AE3D27D4EB4F
_C_S = 0x100000001B3


def _h(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _mix(z: int) -> int:
    z = (z + 0x9E3779B97F4A7C15) & _M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M
    return z ^ (z >> 31)


def ref_walks(pairs, walk_len, walks_per_node, seed, max_start_nodes=None):
    """Pure-python reference implementing the documented contract."""
    adj: dict[str, set[str]] = {}
    for s, o in pairs:
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    nodes = sorted(adj)
    starts = nodes if max_start_nodes is None else nodes[:max_start_nodes]
    seed_key = (seed * _C_S) & _M
    rows = []
    for st in starts:
        for r in range(walks_per_node):
            wkey = _mix(_h(st) ^ ((r * _C_R) & _M) ^ seed_key)
            cur = st
            rows.append((f"{st}#{r}", 0, cur))
            for t in range(1, walk_len):
                nbrs = sorted(adj[cur])
                k = _mix(wkey ^ ((t * _C_T) & _M) ^ _h(cur))
                cur = nbrs[k % len(nbrs)]
                rows.append((f"{st}#{r}", t, cur))
    return (
        pd.DataFrame(rows, columns=["walk_id", "step", "node"])
        .sort_values(["walk_id", "step"], kind="mergesort")
        .reset_index(drop=True)
    )


_PAIRS = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "d"),
    ("d", "e"),
    ("e", "a"),
    ("f", "a"),
]


def _edges_ds():
    return rd.from_pandas(pd.DataFrame(_PAIRS, columns=["s", "o"]))


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[["walk_id", "step", "node"]].copy()
    df["step"] = df["step"].astype("int64")
    return df.sort_values(["walk_id", "step"], kind="mergesort").reset_index(
        drop=True
    )


def test_broadcast_matches_pure_python_reference(ray_session):
    got = _norm(
        random_walks(_edges_ds(), walk_len=6, walks_per_node=2, seed=11).to_pandas()
    )
    want = ref_walks(_PAIRS, walk_len=6, walks_per_node=2, seed=11)
    pd.testing.assert_frame_equal(got, want)


def test_forced_distributed_regime_matches_broadcast(ray_session):
    kw = dict(walk_len=5, walks_per_node=2, seed=3)
    bro = _norm(random_walks(_edges_ds(), **kw).to_pandas())
    dist = _norm(
        random_walks(_edges_ds(), broadcast_threshold=0, num_parts=5, **kw).to_pandas()
    )
    pd.testing.assert_frame_equal(dist, bro)
    # and both match the reference
    pd.testing.assert_frame_equal(bro, ref_walks(_PAIRS, 5, 2, 3))


def test_walk_validity_and_determinism(ray_session):
    got = _norm(
        random_walks(
            _edges_ds(), walk_len=4, walks_per_node=1, seed=7, max_start_nodes=3
        ).to_pandas()
    )
    # max_start_nodes takes the FIRST n sorted nodes
    starts = sorted({w.split("#")[0] for w in got["walk_id"]})
    assert starts == ["a", "b", "c"]
    # every walk has exactly walk_len steps 0..3 and every hop is an edge
    und = {frozenset(p) for p in _PAIRS}
    for wid, g in got.groupby("walk_id"):
        assert list(g["step"]) == [0, 1, 2, 3]
        ns = list(g["node"])
        assert ns[0] == wid.split("#")[0]
        for x, y in zip(ns, ns[1:]):
            assert frozenset((x, y)) in und, (wid, x, y)
    # determinism: a re-run is byte-identical
    again = _norm(
        random_walks(
            _edges_ds(), walk_len=4, walks_per_node=1, seed=7, max_start_nodes=3
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, again)


def test_seed_and_replica_change_the_walks(ray_session):
    a = _norm(random_walks(_edges_ds(), walk_len=6, seed=1).to_pandas())
    b = _norm(random_walks(_edges_ds(), walk_len=6, seed=2).to_pandas())
    assert not a["node"].equals(b["node"])
    two = _norm(random_walks(_edges_ds(), walk_len=6, walks_per_node=2, seed=1).to_pandas())
    r0 = two[two["walk_id"].str.endswith("#0")]["node"].to_numpy()
    r1 = two[two["walk_id"].str.endswith("#1")]["node"].to_numpy()
    assert len(r0) == len(r1) and not (r0 == r1).all()


def test_input_contracts(ray_session):
    with pytest.raises(ValueError):
        random_walks(_edges_ds(), walk_len=0)
    with pytest.raises(ValueError):
        random_walks(_edges_ds(), walks_per_node=0)


@pytest.mark.skipif(
    __import__("os").environ.get("RUN_SCALE_SMOKE") != "1",
    reason="random_walks smoke; run with RUN_SCALE_SMOKE=1 "
    "(result recorded in BASELINE.md)",
)
def test_random_walks_distributed_scale_smoke(ray_session):
    """2x10^6-edge ring+chord graph through the FORCED distributed regime
    (broadcast_threshold=0): 2,000 walkers x 4 co-partitioned steps, each
    step shipping the 4M-row symmetric tagged union — the walker Dataset
    path end to end.  The answer is known EXACTLY: neighbors of b_i are
    {b_(i±1), b_(i±7919)} mod n by construction, so the pure-python
    reference walker recomputes every engine choice from the contract
    without materializing the graph."""
    import time

    import numpy as np

    n = 1_000_000
    i = np.arange(n, dtype=np.int64)
    name = np.char.add("b", i.astype("U7"))
    ring_o = np.char.add("b", ((i + 1) % n).astype("U7"))
    chord_o = np.char.add("b", ((i + 7919) % n).astype("U7"))
    edges = (
        rd.from_pandas(
            pd.DataFrame(
                {
                    "s": np.concatenate([name, name]),
                    "o": np.concatenate([ring_o, chord_o]),
                }
            )
        )
        .repartition(32)
        .materialize()
    )
    assert edges.count() == 2 * n

    t0 = time.time()
    got = (
        random_walks(
            edges,
            walk_len=5,
            walks_per_node=1,
            seed=23,
            max_start_nodes=2_000,
            broadcast_threshold=0,
            num_parts=64,
        )
        .to_pandas()
        .sort_values(["walk_id", "step"], kind="mergesort")
        .reset_index(drop=True)
    )
    t_w = time.time() - t0
    assert len(got) == 2_000 * 5

    # pure-python reference from the analytic adjacency (no graph build)
    def nbrs(node: str) -> list[str]:
        j = int(node[1:])
        return sorted(
            f"b{k % n}" for k in (j - 1, j + 1, j - 7919, j + 7919)
        )

    starts = sorted(f"b{k}" for k in range(n))[:2_000]
    seed_key = (23 * _C_S) & _M
    rows = []
    for st in starts:
        wkey = _mix(_h(st) ^ seed_key)  # r = 0
        cur = st
        rows.append((f"{st}#0", 0, cur))
        for t in range(1, 5):
            ns = nbrs(cur)
            cur = ns[_mix(wkey ^ ((t * _C_T) & _M) ^ _h(cur)) % len(ns)]
            rows.append((f"{st}#0", t, cur))
    want = (
        pd.DataFrame(rows, columns=["walk_id", "step", "node"])
        .sort_values(["walk_id", "step"], kind="mergesort")
        .reset_index(drop=True)
    )
    got["step"] = got["step"].astype("int64")
    want["step"] = want["step"].astype("int64")
    pd.testing.assert_frame_equal(got[["walk_id", "step", "node"]], want)
    print(
        f"SMOKE random_walks sym_edges={4 * n} forced-distributed "
        f"2000x5 walks {t_w:.1f}s exact-match"
    )


def test_skipgram_pairs_hand_case(ray_session):
    from unsupervised_ner_ray.stages.kg import walk_skipgram_pairs

    walks = pd.DataFrame(
        {
            "walk_id": ["w1"] * 4 + ["w2"] * 2,
            "step": [0, 1, 2, 3, 0, 1],
            "node": ["a", "b", "c", "d", "x", "y"],
        }
    )
    # brute force: every pair within |step delta| in [1, 2] of the same walk
    want: dict[tuple, int] = {}
    for wid, g in walks.groupby("walk_id"):
        ns = list(g.sort_values("step")["node"])
        for i in range(len(ns)):
            for j in range(len(ns)):
                if i != j and abs(i - j) <= 2:
                    k = (ns[i], ns[j])
                    want[k] = want.get(k, 0) + 1
    got = (
        walk_skipgram_pairs(rd.from_pandas(walks), window=2, num_parts=3)
        .to_pandas()
        .sort_values(["center", "context"], kind="mergesort")
        .reset_index(drop=True)
    )
    wdf = (
        pd.DataFrame(
            [(c, x, n) for (c, x), n in want.items()],
            columns=["center", "context", "n"],
        )
        .sort_values(["center", "context"], kind="mergesort")
        .reset_index(drop=True)
    )
    got["n"] = got["n"].astype("int64")
    wdf["n"] = wdf["n"].astype("int64")
    pd.testing.assert_frame_equal(got, wdf)


def test_skipgram_partitioning_independence(ray_session):
    from unsupervised_ner_ray.stages.kg import walk_skipgram_pairs

    walks = random_walks(_edges_ds(), walk_len=6, walks_per_node=2, seed=5)
    a = walk_skipgram_pairs(walks, window=2, num_parts=2).to_pandas()
    b = walk_skipgram_pairs(walks, window=2, num_parts=17).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    assert (a["n"] >= 1).all() and a["n"].sum() > 0


def test_skipgram_window_contract(ray_session):
    from unsupervised_ner_ray.stages.kg import walk_skipgram_pairs

    with pytest.raises(ValueError):
        walk_skipgram_pairs(_edges_ds(), window=0)


def _dense_ppmi(pairs_df):
    import numpy as np

    nodes = sorted(set(pairs_df["center"]))
    idx = {n: i for i, n in enumerate(nodes)}
    V = len(nodes)
    C = np.zeros((V, V))
    for c, x, n in pairs_df.itertuples(index=False):
        C[idx[c], idx[x]] = n
    T = C.sum()
    nc = C.sum(axis=1)  # symmetric counts: row marginal == col marginal
    with np.errstate(divide="ignore", invalid="ignore"):
        P = np.log(C * T / np.outer(nc, nc))
    P[~np.isfinite(P)] = 0.0
    P[P < 0] = 0.0
    return nodes, P


def test_graph_embed_spectral_matches_dense_eigh(ray_session):
    import numpy as np

    from unsupervised_ner_ray.stages.kg import (
        graph_embed_spectral,
        walk_skipgram_pairs,
    )

    walks = random_walks(_edges_ds(), walk_len=8, walks_per_node=3, seed=2)
    pairs = walk_skipgram_pairs(walks, window=2)
    out = graph_embed_spectral(pairs, k=2, iters=80).to_pandas()

    nodes, P = _dense_ppmi(pairs.to_pandas())
    evals, evecs = np.linalg.eigh(P)
    order = np.argsort(-np.abs(evals))
    want_vals = evals[order[:2]]
    top = evecs[:, order[:2]]
    # the test graph must have a real |eigen|-gap for subspace convergence
    assert abs(evals[order[1]]) - abs(evals[order[2]]) > 1e-3

    emb = out[out["node"] != ""].pivot(
        index="node", columns="dim", values="weight"
    )
    E = emb.loc[nodes].to_numpy()
    # same invariant subspace (projector distance), orthonormal columns,
    # matching eigenvalues.  Tolerance reflects the iterative rate: the
    # error contracts like (|l3|/|l2|)^iters, and this graph's gap gives
    # ~1e-4 at 80 iterations (exactness is numpy-eigh's job, not ours)
    assert np.linalg.norm(E @ E.T - top @ top.T) < 1e-3
    np.testing.assert_allclose(E.T @ E, np.eye(2), atol=1e-8)
    got_vals = (
        out[out["node"] == ""].sort_values("dim")["weight"].to_numpy()
    )
    np.testing.assert_allclose(got_vals, want_vals, rtol=1e-4, atol=1e-6)


def test_graph_embed_spectral_determinism_and_contract(ray_session):
    import numpy as np

    from unsupervised_ner_ray.stages.kg import (
        graph_embed_spectral,
        walk_skipgram_pairs,
    )

    walks = random_walks(_edges_ds(), walk_len=6, walks_per_node=2, seed=9)
    pairs = walk_skipgram_pairs(walks, window=2)
    a = graph_embed_spectral(pairs, k=3, iters=15).to_pandas()
    b = graph_embed_spectral(pairs, k=3, iters=15).to_pandas()
    np.testing.assert_allclose(
        a["weight"].to_numpy(), b["weight"].to_numpy(), atol=1e-12
    )
    assert list(a.columns) == ["node", "dim", "weight"]
    with pytest.raises(ValueError):
        graph_embed_spectral(pairs, k=0)


# ---------------------------------------------------------------------------
# sampled harmonic centrality


def test_harmonic_centrality_reference_parity(ray_session):
    """Operator == pure-python sampled harmonic centrality: identical
    hash-chosen sources, nanounit-exact contributions, zero for
    unreached nodes."""
    import hashlib
    import random
    from collections import defaultdict, deque

    import ray.data as rd

    from unsupervised_ner_ray.stages.kg import harmonic_centrality

    rng = random.Random(21)
    E = set()
    while len(E) < 50:
        a, b = rng.sample(range(20), 2)
        E.add((min(a, b), max(a, b)))
    # isolated pair far from the core sample sources
    E.add((100, 101))
    df = pd.DataFrame(sorted(E), columns=["s", "o"])

    adj = defaultdict(set)
    for a, b in E:
        adj[str(a)].add(str(b))
        adj[str(b)].add(str(a))
    nodes = sorted(adj)

    def bfs(src, cap):
        d = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            if d[u] == cap:
                continue
            for w in adj[u]:
                if w not in d:
                    d[w] = d[u] + 1
                    q.append(w)
        return d

    hk = {
        v: int.from_bytes(
            hashlib.blake2b(v.encode(), digest_size=8).digest(), "big"
        )
        for v in nodes
    }
    srcs = sorted(nodes, key=lambda v: hk[v])[:4]
    exp = {}
    for v in nodes:
        s_nano, reach = 0, 0
        for u in srcs:
            d = bfs(u, 4).get(v)
            if d and d >= 1:
                s_nano += 1_000_000_000 // d
                reach += 1
        exp[v] = (s_nano / (4 * 1e9), reach)

    got = harmonic_centrality(
        rd.from_pandas(df), sample=4, max_hops=4
    ).to_pandas()
    assert set(got["node"]) == set(nodes)
    for r in got.itertuples():
        eh, er = exp[r.node]
        assert abs(r.harmonic - eh) < 1e-15 and r.reached == er, r.node


# ---------------------------------------------------------------------------
# SGNS negative sampling


def test_skipgram_negatives_contract(ray_session):
    """Positives pass through value-exact; k negatives per positive with
    label 0; samples are deterministic and batching-independent; the
    empirical negative distribution tracks cnt^0.75."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from unsupervised_ner_ray.stages.kg import skipgram_negatives

    rng = np.random.RandomState(3)
    vocab = [f"v{i:02d}" for i in range(12)]
    rows = []
    for i in range(400):
        c, x = rng.choice(vocab, 2, replace=False)
        rows.append((c, x, int(rng.randint(1, 5))))
    pairs = (
        pd.DataFrame(rows, columns=["center", "context", "n"])
        .groupby(["center", "context"], as_index=False)["n"].sum()
    )
    out = skipgram_negatives(
        rd.from_pandas(pairs), k=3, seed=7
    ).to_pandas()
    pos = out[out["label"] == 1].sort_values(["center", "context"])
    exp = pairs.sort_values(["center", "context"])
    assert np.array_equal(pos["center"].to_numpy(), exp["center"].to_numpy())
    assert np.array_equal(pos["context"].to_numpy(), exp["context"].to_numpy())
    assert np.array_equal(pos["n"].to_numpy(), exp["n"].to_numpy())
    neg = out[out["label"] == 0]
    assert len(neg) == 3 * len(pairs)
    # determinism + batching independence: 1-row batches give same multiset
    out2 = skipgram_negatives(
        rd.from_pandas(pairs).repartition(17), k=3, seed=7
    ).to_pandas()
    key = lambda d: sorted(map(tuple, d[["center", "context", "label", "n"]].to_numpy()))
    assert key(out) == key(out2)
    # different seed -> different negatives
    out3 = skipgram_negatives(rd.from_pandas(pairs), k=3, seed=8).to_pandas()
    assert key(out3) != key(out)
    # distribution: negative frequency rank-correlates with cnt^0.75
    marg = pairs.groupby("context")["n"].sum()
    freq = neg["context"].value_counts()
    top_true = set(marg.sort_values(ascending=False).index[:4])
    top_got = set(freq.sort_values(ascending=False).index[:6])
    assert top_true & top_got


# ---------------------------------------------------------------------------
# node2vec biased second-order walks

_C_P = 0x2545F4914F6CDD1D


def ref_node2vec(pairs, walk_len, walks_per_node, p, q, seed):
    """Pure-python reference for the node2vec determinism contract:
    nanounit integer weights (round(1e9/p), 1e9, round(1e9/q)), pick =
    mix(wkey ^ t*C_T ^ H(cur) ^ H(prev)*C_P) mod total_weight on the
    sorted-neighbor integer cumsum."""
    adj: dict[str, set[str]] = {}
    for s, o in pairs:
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    nodes = sorted(adj)
    seed_key = (seed * _C_S) & _M
    w_p, w_q, w_edge = round(1e9 / p), round(1e9 / q), 1_000_000_000
    rows = []
    for st in nodes:
        for r in range(walks_per_node):
            wkey = _mix(_h(st) ^ ((r * _C_R) & _M) ^ seed_key)
            cur, prev = st, None
            rows.append((f"{st}#{r}", 0, cur))
            for t in range(1, walk_len):
                nbrs = sorted(adj[cur])
                if prev is None:
                    w = [1] * len(nbrs)
                    hp = 0
                else:
                    w = [
                        w_p if x == prev else (w_edge if x in adj[prev] else w_q)
                        for x in nbrs
                    ]
                    hp = (_h(prev) * _C_P) & _M
                k = _mix(wkey ^ ((t * _C_T) & _M) ^ _h(cur) ^ hp)
                target = k % sum(w)
                acc = 0
                for i, wi in enumerate(w):
                    acc += wi
                    if acc > target:
                        break
                prev, cur = cur, nbrs[i]
                rows.append((f"{st}#{r}", t, cur))
    return (
        pd.DataFrame(rows, columns=["walk_id", "step", "node"])
        .sort_values(["walk_id", "step"], kind="mergesort")
        .reset_index(drop=True)
    )


_N2V_PAIRS = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),  # square
    ("a", "c"),                                        # chord
    ("d", "e"), ("e", "f"),                            # tail
]


def test_node2vec_matches_pure_python_reference(ray_session):
    from unsupervised_ner_ray.stages.kg import node2vec_walks

    edges = rd.from_pandas(
        pd.DataFrame(_N2V_PAIRS, columns=["s", "o"])
    )
    for p, q in ((4.0, 0.25), (0.5, 2.0), (1.0, 1.0)):
        got = (
            node2vec_walks(edges, walk_len=6, walks_per_node=2, p=p, q=q, seed=7)
            .to_pandas()
            .reset_index(drop=True)
        )
        want = ref_node2vec(_N2V_PAIRS, 6, 2, p, q, 7)
        pd.testing.assert_frame_equal(got, want)


def test_node2vec_validity_and_batching_independence(ray_session):
    from unsupervised_ner_ray.stages.kg import node2vec_walks

    df = pd.DataFrame(_N2V_PAIRS, columns=["s", "o"])
    out1 = node2vec_walks(rd.from_pandas(df), walk_len=5, seed=3).to_pandas()
    out2 = node2vec_walks(
        rd.from_pandas(df).repartition(5), walk_len=5, seed=3
    ).to_pandas()
    pd.testing.assert_frame_equal(
        out1.reset_index(drop=True), out2.reset_index(drop=True)
    )
    und = set()
    for s, o in _N2V_PAIRS:
        und.add((s, o))
        und.add((o, s))
    for _, g in out1.groupby("walk_id"):
        seq = g.sort_values("step")["node"].tolist()
        assert all((a, b) in und for a, b in zip(seq, seq[1:]))


def test_node2vec_pq_bias_extremes(ray_session):
    """Cycle graph: p>>1, q<<1 never backtracks (all nodes distinct in a
    short walk); p<<1, q>>1 always returns (oscillates on 2 nodes)."""
    from unsupervised_ner_ray.stages.kg import node2vec_walks

    cyc = pd.DataFrame(
        {"s": [f"n{i}" for i in range(6)], "o": [f"n{(i + 1) % 6}" for i in range(6)]}
    )
    dfs = node2vec_walks(
        rd.from_pandas(cyc), walk_len=5, p=100.0, q=0.01, seed=3
    ).to_pandas()
    assert (
        dfs.groupby("walk_id")["node"].apply(lambda x: len(set(x))) == 5
    ).all()
    ret = node2vec_walks(
        rd.from_pandas(cyc), walk_len=5, p=0.01, q=100.0, seed=3
    ).to_pandas()
    assert (
        ret.groupby("walk_id")["node"].apply(lambda x: len(set(x))) == 2
    ).all()


def test_node2vec_contracts(ray_session):
    from unsupervised_ner_ray.stages.kg import node2vec_walks

    edges = rd.from_pandas(pd.DataFrame(_N2V_PAIRS, columns=["s", "o"]))
    with pytest.raises(ValueError):
        node2vec_walks(edges, walk_len=0)
    with pytest.raises(ValueError):
        node2vec_walks(edges, p=0.0)
    with pytest.raises(NotImplementedError):
        node2vec_walks(edges, csr_max_sym_edges=3)
    # max_start_nodes takes the first n sorted nodes
    out = node2vec_walks(edges, walk_len=3, max_start_nodes=2).to_pandas()
    assert set(w.split("#")[0] for w in out["walk_id"]) == {"a", "b"}


@pytest.mark.skipif(
    __import__("os").environ.get("RUN_SCALE_SMOKE") != "1",
    reason="node2vec smoke; run with RUN_SCALE_SMOKE=1",
)
def test_node2vec_scale_smoke(ray_session):
    """10^6-node ring+chord graph (4M symmetrized edges) through the CSR
    regime: 2,000 biased walkers x 5 steps; every engine choice recomputed
    exactly from the analytic adjacency by the pure-python contract walker
    (weights from the ring structure: neighbor membership of N(prev) is
    analytic, no graph materialization)."""
    import time

    import numpy as np

    from unsupervised_ner_ray.stages.kg import node2vec_walks

    n = 1_000_000
    i = np.arange(n, dtype=np.int64)
    name = np.char.add("b", i.astype("U7"))
    ring_o = np.char.add("b", ((i + 1) % n).astype("U7"))
    chord_o = np.char.add("b", ((i + 7919) % n).astype("U7"))
    edges = (
        rd.from_pandas(
            pd.DataFrame(
                {
                    "s": np.concatenate([name, name]),
                    "o": np.concatenate([ring_o, chord_o]),
                }
            )
        )
        .repartition(32)
        .materialize()
    )

    p_, q_ = 4.0, 0.25
    t0 = time.time()
    got = (
        node2vec_walks(
            edges, walk_len=5, p=p_, q=q_, seed=23, max_start_nodes=2_000
        )
        .to_pandas()
        .sort_values(["walk_id", "step"], kind="mergesort")
        .reset_index(drop=True)
    )
    t_w = time.time() - t0
    assert len(got) == 2_000 * 5

    def nbrs(node: str) -> list[str]:
        j = int(node[1:])
        return sorted(f"b{k % n}" for k in (j - 1, j + 1, j - 7919, j + 7919))

    w_p, w_q, w_edge = round(1e9 / p_), round(1e9 / q_), 1_000_000_000
    starts = sorted(f"b{k}" for k in range(n))[:2_000]
    seed_key = (23 * _C_S) & _M
    rows = []
    for st in starts:
        wkey = _mix(_h(st) ^ seed_key)  # r = 0
        cur, prev = st, None
        rows.append((f"{st}#0", 0, cur))
        for t in range(1, 5):
            ns = nbrs(cur)
            if prev is None:
                w = [1] * len(ns)
                hp = 0
            else:
                pn = set(nbrs(prev))
                w = [
                    w_p if x == prev else (w_edge if x in pn else w_q)
                    for x in ns
                ]
                hp = (_h(prev) * _C_P) & _M
            k = _mix(wkey ^ ((t * _C_T) & _M) ^ _h(cur) ^ hp)
            target = k % sum(w)
            acc = 0
            for idx, wi in enumerate(w):
                acc += wi
                if acc > target:
                    break
            prev, cur = cur, ns[idx]
            rows.append((f"{st}#0", t, cur))
    want = (
        pd.DataFrame(rows, columns=["walk_id", "step", "node"])
        .sort_values(["walk_id", "step"], kind="mergesort")
        .reset_index(drop=True)
    )
    got["step"] = got["step"].astype("int64")
    want["step"] = want["step"].astype("int64")
    pd.testing.assert_frame_equal(got[["walk_id", "step", "node"]], want)
    print(
        f"SMOKE node2vec sym_edges={4 * n} CSR regime 2000x5 biased walks "
        f"{t_w:.1f}s exact-match"
    )
