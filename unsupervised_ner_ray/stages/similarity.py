"""Similarity search over an embedding column (vec_id, embedding list<float>).

* ``brute_force_topk`` — the exactness baseline: the query matrix is
  broadcast (ray.put once, fetched in each actor's __init__), each batch
  computes a numpy matmul + per-batch top-k partial result, and a tiny
  groupby(query) merge picks the global top-k.  The full corpus streams;
  only (n_queries x k) partials shuffle.
* ``ivf_topk`` — the scale path: a k-means codebook trained on a sample
  (driver-side, numpy), assignment in map_batches, and probing only the
  ``nprobe`` closest clusters per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _list_col_to_matrix(col) -> np.ndarray:
    """Zero-copy-ish list<float> column -> (n, d) float64 matrix: flatten the
    Arrow values buffer and reshape (all rows same length, no nulls — the
    embeddings-table contract), instead of a Python to_pylist round-trip."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return flat.reshape(n, -1)


class _TopKScorer:
    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = q / np.maximum(np.linalg.norm(q, axis=1)[:, None], 1e-12)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # e.g. an IVF-pruned block with no probed rows
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        emb = _list_col_to_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        normed = emb / np.maximum(np.linalg.norm(emb, axis=1)[:, None], 1e-12)
        sims = self.q @ normed.T  # (Q, B)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_sim = [], [], []
        # per-batch partial top-k per query
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        for qi in range(sims.shape[0]):
            for j in idx[qi]:
                out_q.append(qi)
                out_id.append(ids[j])
                out_sim.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )


def brute_force_topk(embeds, queries: np.ndarray, k: int = 10, concurrency: int = 4):
    """Exact cosine top-k for each query row of ``queries`` (Q, D)."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = embeds.map_batches(
        _TopKScorer,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )

    # partials are (n_blocks x Q x k) rows — tiny — so the global top-k merge
    # is a local pandas groupby on the driver rather than an all-to-all
    # shuffle.  (For thousands of simultaneous queries use the distributed
    # form: .groupby("query_idx").map_groups(same merge fn).)
    df = partials.to_pandas()

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (
        df.groupby("query_idx", sort=True, group_keys=False)[df.columns.tolist()]
        .apply(_merge)
        .reset_index(drop=True)
    )
    import ray.data as rd

    return rd.from_pandas(out)


def _stable_sample_order(sample):
    """Row order of a ``random_sample(...).to_pandas()`` pull depends on
    block scheduling, and the k-means trainers below seed their init from
    POSITIONAL indices into that frame — so two runs over the same rows
    could train different codebooks.  Sort the driver-side sample by a
    stable key (``vec_id`` when present, else the raw embedding bytes) so
    codebook training is a pure function of the sampled row SET."""
    if "vec_id" in sample.columns:
        return sample.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
    key = sample["embedding"].map(lambda v: np.asarray(v, dtype=np.float64).tobytes())
    return (
        sample.assign(_key=key)
        .sort_values("_key", kind="mergesort")
        .drop(columns="_key")
        .reset_index(drop=True)
    )


def train_ivf_codebook(
    embeds, n_clusters: int = 16, sample_frac: float = 0.2, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Mini k-means on a sample (driver-side; the sample is small by design)."""
    sample = embeds.random_sample(sample_frac, seed=seed).to_pandas()
    sample = _stable_sample_order(sample)
    x = np.stack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    rng = np.random.RandomState(seed)
    centers = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(centers)):
            m = assign == c
            if m.any():
                centers[c] = x[m].mean(0)
    return centers


def ivf_topk(embeds, queries: np.ndarray, codebook: np.ndarray, k: int = 10, nprobe: int = 4):
    """IVF-style ANN: probe only the ``nprobe`` nearest clusters per query.

    Assignment happens in map_batches (codebook captured in the closure —
    it is tiny); non-probed rows are filtered before any scoring.
    """
    q = np.asarray(queries, dtype=np.float64)
    qd = ((q[:, None, :] - codebook[None, :, :]) ** 2).sum(-1)
    probe_sets = [set(np.argsort(qd[i])[:nprobe].tolist()) for i in range(len(q))]
    probed_clusters = set().union(*probe_sets) if probe_sets else set()

    def _assign_filter(batch: pa.Table) -> pa.Table:
        emb = _list_col_to_matrix(batch.column("embedding"))
        d = ((emb[:, None, :] - codebook[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        mask = np.isin(assign, list(probed_clusters))
        return batch.filter(pa.array(mask)).append_column(
            "cluster", pa.array(assign[mask], pa.int32())
        )

    pruned = embeds.map_batches(_assign_filter, batch_format="pyarrow")
    return brute_force_topk(pruned, q, k)


def embedding_centroids(sf_dir: str, scale: int = 1_000_000):
    """Per-language embedding centroid PARTIALS: (lang, dim, sum_micro, n).

    The vector-column aggregation every embedding pipeline needs (class
    centroids, cluster updates, mean-pooling) in its scale shape: the lang
    lookup broadcasts as a dense doc_id-indexed code array, each batch
    flattens its list column zero-copy and accumulates per-(lang, dim)
    partial sums with ONE np.add.at over a composite index, and the final
    combine is a C-path groupby over |langs| x dim rows — the fact vectors
    never shuffle.  Sums are int64 micro-units (floor(x*1e6)) so the oracle
    hash cannot be perturbed by float summation order.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    from ..sources.io import read_sf

    docs = read_sf(sf_dir, "documents", columns=["doc_id", "lang"]).to_pandas()
    langs = sorted(docs["lang"].unique())
    lang_idx = {v: i for i, v in enumerate(langs)}
    size = int(docs["doc_id"].max()) + 1
    codes = np.full(size, -1, dtype=np.int32)
    codes[docs["doc_id"].to_numpy()] = docs["lang"].map(lang_idx).to_numpy()
    ref = ray.put((codes, langs))

    class Partials:
        def __init__(self):
            self.codes, self.langs = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            n = len(t)
            if n == 0:
                return pa.table(
                    {
                        "lang": pa.array([], pa.string()),
                        "dim": pa.array([], pa.int64()),
                        "sum_micro": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            flat = (
                pc.list_flatten(t.column("embedding"))
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            dim = flat.size // n
            M = np.floor(flat * scale).astype(np.int64).reshape(n, dim)
            vec_ids = t.column("vec_id").to_numpy()
            lcodes = self.codes[vec_ids]
            keep = lcodes >= 0
            M, lcodes = M[keep], lcodes[keep]
            nl = len(self.langs)
            acc = np.zeros(nl * dim, dtype=np.int64)
            np.add.at(acc, (lcodes[:, None] * dim + np.arange(dim)[None, :]).ravel(), M.ravel())
            cnt = np.bincount(lcodes, minlength=nl)
            present = cnt > 0
            li = np.repeat(np.arange(nl)[present], dim)
            return pa.table(
                {
                    "lang": pa.array([self.langs[i] for i in li], pa.string()),
                    "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), int(present.sum()))),
                    "sum_micro": pa.array(acc.reshape(nl, dim)[present].ravel(), pa.int64()),
                    "n": pa.array(np.repeat(cnt[present], dim), pa.int64()),
                }
            )

    emb = read_sf(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return (
        emb.map_batches(Partials, batch_format="pyarrow", concurrency=(1, 4))
        .groupby(["lang", "dim"])
        .aggregate(Sum("sum_micro", alias_name="sum_micro"), Sum("n", alias_name="n"))
        .sort(["lang", "dim"])
    )


def kmeans_distributed(
    embeds, k: int = 8, iters: int = 5, tol: float = 0.0, scale: int = 1_000_000
):
    """Fully distributed Lloyd's k-means over an embedding Dataset — the
    iterative-training loop shape (same as a distributed SGD epoch): per
    iteration the k x dim centroid matrix broadcasts via ``ray.put``, each
    batch assigns its vectors with one matmul (||x||² - 2x·c + ||c||²,
    ties to the LOWEST centroid index for determinism) and emits
    pre-combined (cluster, dim, partial_sum, count) rows, and a C-path
    groupby reduces k x dim rows — the fact vectors never leave their
    blocks and nothing node-sized lives on the driver.

    Init is deterministic: the k vectors with the lowest vec_id.
    Returns (centroids ndarray (k, dim) float64, assignments Dataset
    (vec_id, cluster)).  Distributed/local equivalence is pinned by test
    (per-batch partial sums reassociate float adds, so centroids match a
    local Lloyd's run to ~1e-9, with identical assignments).
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..sources.io import read_sf  # noqa: F401  (callers pass a Dataset)

    seed_rows = embeds.sort("vec_id").limit(k).to_pandas()
    centroids = np.stack(
        [np.asarray(v, dtype=np.float64) for v in seed_rows["embedding"]]
    )
    dim = centroids.shape[1]

    def _batch_mat(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        flat = (
            pc.list_flatten(t.column("embedding"))
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        X = flat.reshape(len(t), dim)
        ids = t.column("vec_id").to_numpy()
        return ids, X

    for _ in range(iters):
        c_ref = ray.put(centroids)

        def _partials(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "s": pa.array([], pa.float64()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            C = ray.get(c_ref)
            _, X = _batch_mat(t)
            d = (X**2).sum(1)[:, None] - 2.0 * X @ C.T + (C**2).sum(1)[None, :]
            assign = d.argmin(1)  # numpy argmin takes the FIRST (lowest) min
            kk = C.shape[0]
            acc = np.zeros((kk, dim), dtype=np.float64)
            np.add.at(acc, assign, X)
            cnt = np.bincount(assign, minlength=kk)
            present = cnt > 0
            ci = np.arange(kk)[present]
            return pa.table(
                {
                    "cluster": pa.array(np.repeat(ci, dim), pa.int64()),
                    "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(ci))),
                    "s": pa.array(acc[present].ravel(), pa.float64()),
                    "n": pa.array(np.repeat(cnt[present], dim), pa.int64()),
                }
            )

        agg = (
            embeds.map_batches(_partials, batch_format="pyarrow")
            .groupby(["cluster", "dim"])
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .to_pandas()  # k x dim rows — constant-size, never data-sized
        )
        new = centroids.copy()
        piv = agg.pivot(index="cluster", columns="dim", values="s")
        cnts = agg.groupby("cluster")["n"].first()
        for c in piv.index:
            if cnts[c] > 0:
                new[int(c)] = piv.loc[c].to_numpy() / cnts[c]
        shift = float(np.abs(new - centroids).max())
        centroids = new
        if shift <= tol:
            break

    c_ref = ray.put(centroids)

    def _assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
            )
        C = ray.get(c_ref)
        ids, X = _batch_mat(t)
        d = (X**2).sum(1)[:, None] - 2.0 * X @ C.T + (C**2).sum(1)[None, :]
        return pa.table(
            {"vec_id": pa.array(ids), "cluster": pa.array(d.argmin(1).astype(np.int64))}
        )

    return centroids, embeds.map_batches(_assign, batch_format="pyarrow")


def train_pq_codebooks(
    embeds,
    m_sub: int = 16,
    n_codes: int = 64,
    sample_frac: float = 0.25,
    iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Product-quantization codebooks: split the D dims into ``m_sub``
    subspaces and run a deterministic mini k-means per subspace on a
    driver-side sample (the sample is small by design, like
    ``train_ivf_codebook``).  Returns (m_sub, n_codes, D/m_sub) float64.

    At 100 TB the sample is a ``random_sample`` over the streaming dataset
    (rows never accumulate beyond the sample) and the codebooks are a few
    KB — they broadcast via ``ray.put`` to every encode/score actor.
    """
    sample = embeds.random_sample(sample_frac, seed=seed).to_pandas()
    sample = _stable_sample_order(sample)
    x = np.stack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    d = x.shape[1]
    if d % m_sub != 0:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    dsub = d // m_sub
    rng = np.random.RandomState(seed)
    books = np.zeros((m_sub, n_codes, dsub), dtype=np.float64)
    for s in range(m_sub):
        xs = x[:, s * dsub : (s + 1) * dsub]
        k = min(n_codes, len(xs))
        centers = xs[rng.choice(len(xs), size=k, replace=False)].copy()
        for _ in range(iters):
            dist = ((xs[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
            assign = dist.argmin(1)
            for c in range(k):
                m = assign == c
                if m.any():
                    centers[c] = xs[m].mean(0)
        books[s, :k] = centers
        if k < n_codes:  # duplicate the last center so every code is valid
            books[s, k:] = centers[-1]
    return books


def pq_encode(embeds, codebooks: np.ndarray):
    """Encode each embedding to ``m_sub`` uint8 codes (one argmin matmul per
    subspace, vectorized over the batch) — a 32x compression for
    dim=64/float32 at m_sub=8, which is what makes billion-vector rescoring
    feasible: downstream ADC scoring touches ONLY the code table; the fat
    vector column never leaves the original blocks.

    Output schema: (vec_id int64, codes fixed-ish list<uint8> of len m_sub).
    """
    ref = ray.put(np.asarray(codebooks, dtype=np.float64))

    class _Encoder:
        def __init__(self):
            self.B = ray.get(ref)  # (m, n_codes, dsub)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "codes": pa.array([], pa.list_(pa.uint8())),
                    }
                )
            X = _list_col_to_matrix(t.column("embedding"))
            m, _, dsub = self.B.shape
            codes = np.empty((len(X), m), dtype=np.uint8)
            for s in range(m):  # m is ~8 — the loop is over subspaces, not rows
                xs = X[:, s * dsub : (s + 1) * dsub]
                C = self.B[s]
                dist = (xs**2).sum(1)[:, None] - 2.0 * xs @ C.T + (C**2).sum(1)[None, :]
                codes[:, s] = dist.argmin(1).astype(np.uint8)
            return pa.table(
                {
                    "vec_id": t.column("vec_id"),
                    "codes": pa.array(list(codes), pa.list_(pa.uint8())),
                }
            )

    return embeds.map_batches(_Encoder, batch_format="pyarrow", concurrency=(1, 4))


def pq_topk(codes_ds, codebooks: np.ndarray, queries: np.ndarray, k: int = 10):
    """ADC (asymmetric distance computation) top-k over a PQ code table:
    per query build an (m_sub, n_codes) lookup table of squared distances
    query-subvector -> code centroid ONCE, then each batch scores rows with
    pure integer gathers ``lut[s, codes[:, s]].sum()`` — no float vector
    math per row.  Per-batch partial top-k + the same tiny merge as
    ``brute_force_topk``; only (n_blocks x Q x k) scalar rows ever move.

    Returns (query_idx, vec_id, adc_dist, rank) sorted by (query_idx, rank).
    """
    B = np.asarray(codebooks, dtype=np.float64)  # (m, n_codes, dsub)
    q = np.asarray(queries, dtype=np.float64)
    m, n_codes, dsub = B.shape
    # (Q, m, n_codes) LUT of squared sub-distances
    qs = q.reshape(len(q), m, dsub)
    lut = ((qs[:, :, None, :] - B[None, :, :, :]) ** 2).sum(-1)
    lut_ref = ray.put(lut)

    class _ADC:
        def __init__(self):
            self.lut = ray.get(lut_ref)  # (Q, m, n_codes)

        def __call__(self, t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "query_idx": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "adc_dist": pa.array([], pa.float64()),
                }
            )
            if len(t) == 0:
                return empty
            col = t.column("codes")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            codes = col.flatten().to_numpy(zero_copy_only=False).reshape(len(t), -1)
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            Q = self.lut.shape[0]
            sub = np.arange(codes.shape[1])[None, :]  # (1, m)
            out_q, out_id, out_d = [], [], []
            kk = min(len(t), max(1, int(k)))
            for qi in range(Q):  # loop over queries (small); rows vectorized
                d = self.lut[qi][sub, codes].sum(1)  # (B,)
                idx = np.argpartition(d, kth=kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(ids[idx].tolist())
                out_d.extend(d[idx].tolist())
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int32()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "adc_dist": pa.array(out_d, pa.float64()),
                }
            )

    partials = codes_ds.map_batches(_ADC, batch_format="pyarrow", concurrency=(1, 4))
    df = partials.to_pandas()  # n_blocks x Q x k rows — tiny by construction

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc_dist", "vec_id"], ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (
        df.groupby("query_idx", sort=True, group_keys=False)[df.columns.tolist()]
        .apply(_merge)
        .reset_index(drop=True)
    )
    import ray.data as rd

    return rd.from_pandas(out)


def pca_top(embeds, method: str = "auto", cov_max_dim: int = 2048,
            iters: int = 30, block: int = 8, seed: int = 7):
    """Top principal component of the embedding matrix — the spectral face
    of the iterative family (k-means = centroid EM, PageRank =
    stochastic-matrix fixpoint, this = dominant eigenvector of the
    covariance).  LSA / PCA whitening / spectral outlier screens in
    training-data prep all reduce to this.

    Two regimes, split on dimensionality (``method="auto"``):

    * ``cov`` (d <= ``cov_max_dim``, the usual embedding case): ONE
      streaming pass accumulates the uncentered second-moment partials
      ``X'X`` (d x d), column sums and count per batch; a C-path groupby
      Sum merges the (i, j) partial rows and the driver finishes with a
      dense ``eigh`` on the d x d matrix — EXACT (no iteration), driver
      state O(d^2), corpus never shuffles.  Centering folds in
      analytically: Cov = X'X/n - mu mu'.
    * ``power`` (huge d, where d^2 partials are too big): block power
      iteration with Rayleigh-Ritz — per iteration the d x ``block``
      orthonormal basis broadcasts via ``ray.put``; each batch emits
      ``X'(XV)`` partials (d x block) and the driver re-orthonormalizes
      (QR) and extracts the Ritz vector.  Convergence is governed by
      lambda_{block+1}/lambda_1 — the block buys convergence on clustered
      spectra where plain power iteration stalls.  Deterministic: seeded
      start, fixed iteration count, QR with sign-fixed R diagonal.

    Both regimes fix the output sign (largest-|w| component positive).
    Output: (dim, weight) rows — dim 0 carries the eigenvalue (variance
    along the component), dims 1..d the unit eigenvector.  No SQL twin
    (spectral op) — pinned by numpy-SVD parity tests on both paths.
    """
    first = embeds.take(1)[0]
    d = len(first["embedding"])
    if method == "auto":
        method = "cov" if d <= cov_max_dim else "power"

    def _finish(v: np.ndarray, eigval: float) -> pd.DataFrame:
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        return pd.DataFrame(
            {
                "dim": np.arange(0, d + 1, dtype=np.int64),
                "weight": np.concatenate([[eigval], v]),
            }
        )

    from ray.data.aggregate import Sum

    if method == "cov":

        def _moments(t: pa.Table) -> pa.Table:
            n = len(t)
            if n == 0:
                return pa.table({"i": pa.array([], pa.int64()),
                                 "val": pa.array([], pa.float64())})
            X = _list_col_to_matrix(t.column("embedding"))
            # row layout: d*d gram entries, then d column sums, then count
            vals = np.concatenate([(X.T @ X).ravel(), X.sum(axis=0), [float(n)]])
            return pa.table(
                {"i": pa.array(np.arange(vals.size, dtype=np.int64)),
                 "val": pa.array(vals, pa.float64())}
            )

        out = (
            embeds.map_batches(_moments, batch_format="pyarrow")
            .groupby("i")
            .aggregate(Sum("val", alias_name="val"))
            .to_pandas()
            .sort_values("i")["val"]
            .to_numpy(np.float64)
        )
        gram, colsum, n_rows = out[: d * d].reshape(d, d), out[d * d : d * d + d], out[-1]
        mu = colsum / n_rows
        cov = gram / n_rows - np.outer(mu, mu)
        w, V = np.linalg.eigh(cov)
        return _finish(V[:, -1], float(w[-1]))

    # ---- block power iteration (huge-d regime) ----
    def _factory(vref, mode):
        class _P:
            def __init__(self):
                self.V = ray.get(vref)

            def __call__(self, t: pa.Table) -> pa.Table:
                n = len(t)
                if n == 0:
                    return pa.table({"i": pa.array([], pa.int64()),
                                     "val": pa.array([], pa.float64())})
                X = _list_col_to_matrix(t.column("embedding"))
                if mode == "stats":
                    vals = np.concatenate([X.sum(axis=0), [float(n)]])
                else:
                    XV = X @ self.V              # (n, p)
                    vals = np.concatenate(
                        [(X.T @ XV).ravel(), XV.sum(axis=0)]
                    )                            # d*p partials + p col sums
                return pa.table(
                    {"i": pa.array(np.arange(vals.size, dtype=np.int64)),
                     "val": pa.array(vals, pa.float64())}
                )

        return _P

    def _reduce(ds_partials) -> np.ndarray:
        out = (
            ds_partials.groupby("i").aggregate(Sum("val", alias_name="val")).to_pandas()
        )
        return out.sort_values("i")["val"].to_numpy(np.float64)

    stats = _reduce(
        embeds.map_batches(
            _factory(ray.put(np.zeros(d)), "stats"),
            batch_format="pyarrow", concurrency=(1, 4),
        )
    )
    n_rows = stats[d]
    mu = stats[:d] / n_rows

    rng = np.random.default_rng(seed)
    p = min(block, d)
    V, _ = np.linalg.qr(rng.standard_normal((d, p)))
    ritz_val, ritz_vec = 0.0, V[:, 0]
    for _ in range(iters):
        part = _reduce(
            embeds.map_batches(
                _factory(ray.put(V), "iter"),
                batch_format="pyarrow", concurrency=(1, 4),
            )
        )
        gramV = part[: d * p].reshape(d, p)
        colsV = part[d * p :]
        AV = gramV / n_rows - np.outer(mu, colsV / n_rows)  # Cov @ V
        # Rayleigh-Ritz on the current subspace, then re-orthonormalize
        H = V.T @ AV
        w, U = np.linalg.eigh((H + H.T) / 2.0)
        ritz_val, ritz_vec = float(w[-1]), V @ U[:, -1]
        Q, R = np.linalg.qr(AV)
        Q = Q * np.sign(np.where(np.diag(R) == 0, 1.0, np.diag(R)))[None, :]
        V = Q
    return _finish(ritz_vec / np.linalg.norm(ritz_vec), ritz_val)


def semantic_dedup(
    embeds,
    k: int = 8,
    threshold: float = 0.95,
    iters: int = 3,
    num_parts: int = 64,
):
    """Semantic deduplication, the SemDeDup shape (Abbas et al., 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then find
    cosine near-duplicates only WITHIN each cluster — the pruning that
    turns an O(N²) all-pairs problem into sum(c²) over clusters.  Choose
    ``k`` proportional to N (SemDeDup uses N/k ~ 1k-10k members) so the
    per-cluster similarity matrix stays worker-sized; the cluster pass is
    one matmul per cluster.

    Distributed shape: ``kmeans_distributed`` never holds vectors on the
    driver (broadcast centroids, combiner partials); assignment is one
    extra broadcast-matmul pass; per-cluster dedup runs inside coarse hash
    partitions keyed on the cluster id (every member of a cluster lands in
    one partition — the partitioning assumption to document: max cluster
    size bounds per-task memory, so k must scale with N).

    Within a cluster, vectors are L2-normalized and the ``>= threshold``
    cosine graph's connected components are resolved locally (union-find
    over the upper-triangle edges); the LOWEST vec_id in each component is
    kept — deterministic, like every keep rule in this repo.  Zero-norm
    vectors are their own component (cosine undefined -> never a dup).

    Returns a Dataset (vec_id, cluster, keep) sorted by vec_id.  Not
    SQL-expressible (iterative k-means) -> rows-only query; pinned by
    planted-duplicate, threshold-boundary and determinism tests.

    Known caveat (inherited from SemDeDup itself): duplicates that
    straddle a cluster boundary are missed.  The deterministic
    lowest-vec_id k-means init makes this concrete: if several of the k
    seed vectors fall inside ONE tight duplicate group, that group is
    split across clusters and its members are never compared.  At scale
    (k << N, data not sorted by similarity) seeds are far apart with
    overwhelming probability; for adversarially ordered inputs shuffle
    ids or raise iters.
    """
    import pyarrow.compute as pc

    from .grouping import partitioned_map_groups

    centroids, _ = kmeans_distributed(embeds, k=k, iters=iters)
    dim = centroids.shape[1]
    c_ref = ray.put(centroids)

    def _assign(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "cluster": pd.Series([], dtype="int64"),
                    "emb": pd.Series([], dtype=object),
                }
            )
        C = ray.get(c_ref)
        flat = (
            pc.list_flatten(t.column("embedding"))
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        X = flat.reshape(len(t), dim)
        d = (X**2).sum(1)[:, None] - 2.0 * X @ C.T + (C**2).sum(1)[None, :]
        return pd.DataFrame(
            {
                "vec_id": t.column("vec_id").to_numpy(),
                "cluster": d.argmin(1).astype(np.int64),
                "emb": list(X),
            }
        )

    assigned = embeds.map_batches(_assign, batch_format="pyarrow")

    def _dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="mergesort")
        ids = g["vec_id"].to_numpy()
        X = np.stack(g["emb"].to_numpy())
        norms = np.linalg.norm(X, axis=1)
        ok = norms > 0
        Xn = np.where(ok[:, None], X / np.where(ok, norms, 1.0)[:, None], 0.0)
        S = Xn @ Xn.T
        m = len(ids)
        # union-find over >= threshold upper-triangle edges
        parent = np.arange(m)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ei, ej = np.nonzero(np.triu(S >= threshold, 1))
        for a, b in zip(ei, ej):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(m)])
        # rows are vec_id-sorted, so the component root IS the lowest id
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": g["cluster"].to_numpy(),
                "keep": roots == np.arange(m),
            }
        )

    return partitioned_map_groups(
        assigned, "cluster", _dedup_cluster, num_parts=num_parts
    ).sort("vec_id")
