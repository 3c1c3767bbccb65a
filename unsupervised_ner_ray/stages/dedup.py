"""Deduplication operators (exact + near-dup families).

All stages follow the shuffle discipline: vectorized signature computation in
``map_batches``, then groupbys only over signatures/candidate keys (never the
raw text).  Reference analogs: exact line dedup
(/root/reference/ensemble/pick_unique_lines.py:17-31), `sort -u` vocab merges
(c.sh:5-10).  Near-dup families are engine-new (driver mandate).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_MERSENNE = (1 << 61) - 1


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _shingles(text: str, k: int = 3) -> list[str]:
    toks = [t for t in text.split(" ") if t]
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def exact_dedup(docs, key_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: hash-partitioned groupby on a content hash, keep the row
    with the minimum id per group (deterministic 'first').

    Output: content_hash, keep_id (min id), n_dups.
    SQL oracle: GROUP BY md5(text) -> min(doc_id), count(*).
    """

    def _hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(key_col).to_pylist()
        return pa.table(
            {
                "content_hash": pa.array(
                    [hashlib.md5(t.encode()).hexdigest() for t in texts], pa.string()
                ),
                id_col: batch.column(id_col),
            }
        )

    from ray.data.aggregate import Count, Min

    hashed = docs.map_batches(_hash, batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups")
    )


def exact_dedup_fast(docs, key_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup keyed by a vectorized 64-bit content hash
    (``pd.util.hash_pandas_object`` — one C pass per batch) instead of the
    per-row-md5 of :func:`exact_dedup`.  Same downstream shape (hash
    groupby, Min/Count).  No SQL twin — the hash isn't SQL-expressible — so
    it is pinned to the md5 path by an equivalence test on group structure.
    A 64-bit key collides around ~4e9 distinct docs (birthday bound); at
    10^12-doc scale widen to two hash columns with different keys.
    Output: content_key (int64), keep_id (min id), n_dups."""
    from ray.data.aggregate import Count, Min

    def _hash(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.column(key_col).to_pandas(), index=False
        )
        return pa.table(
            {
                "content_key": pa.array(h.to_numpy().view(np.int64)),
                id_col: batch.column(id_col),
            }
        )

    return (
        docs.map_batches(_hash, batch_format="pyarrow")
        .groupby("content_key")
        .aggregate(Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups"))
    )


class MinHasher:
    """MinHash signatures (actor: permutation constants built once).

    Overflow-safe vectorized permutations in uint64: coefficients ``a`` and
    shingle bases are 31-bit, so ``a*base + b`` <= 2^62 + 2^61 stays inside
    uint64 and the mod-Mersenne reduction is exact — no object-dtype bigint
    fallback in the hot loop.

    The per-DOC loop in ``__call__`` is retained deliberately: a fully
    batch-vectorized variant (object-array shingle concat, factorize +
    blake2b per distinct shingle, one chunked (H, S) permutation matrix,
    ``np.minimum.reduceat`` per doc) was built and A/B-measured at 0.8x
    (all-distinct shingles) to 1.1x (dup-heavy) of this version — the hot
    work is already the per-doc numpy permutation matrix, so batching
    columns buys nothing and costs a cache-thrashing (H, S) temporary."""

    def __init__(self, num_hashes: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 1 << 31, size=num_hashes).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_hashes).astype(np.uint64)
        self.num_hashes = num_hashes
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.num_hashes, _MERSENNE, dtype=np.int64)
        base = np.array(
            [_stable_hash64(s) & 0x7FFFFFFF for s in sh], dtype=np.uint64
        )
        perm = (self.a[:, None] * base[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return np.min(perm, axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "minhash": pa.array([s.tolist() for s in sigs], pa.list_(pa.int64())),
            }
        )


def minhash_signatures(docs, num_hashes: int = 64, shingle_k: int = 3, concurrency: int = 4):
    return docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_hashes": num_hashes, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )


def minhash_lsh_pairs(
    docs,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    driver_merge_max_rows: int = 5_000_000,
):
    """MinHash+LSH near-dup pairs.

    signatures (map_batches) -> explode (band_id, band_hash, doc_id) ->
    groupby band bucket -> candidate pairs -> estimated Jaccard from
    signature agreement -> keep >= threshold.  Only band keys and candidate
    pairs shuffle; signatures travel with the pair rows for verification.
    Output: (a, b, est_jaccard), a < b, deduplicated.

    Duplicate-bucket detection has two equivalent paths, chosen by band-row
    count: below ``driver_merge_max_rows`` the per-block partial counts
    (a few bytes per distinct key) merge on the driver with NO shuffle;
    above it the same computation runs as a distributed
    ``groupby("band_hash").Count`` reduce — the 100 TB path, exercised by a
    dedicated equivalence test rather than left as a comment.
    """
    rows_per_band = num_hashes // bands
    # signatures are computed once and re-consumed for verification; at this
    # size pinning them is cheap (at 100 TB they'd be written to parquet and
    # re-read, same as the tagged-docs checkpoint layout)
    sigs = minhash_signatures(docs, num_hashes, shingle_k).materialize()

    def _explode(batch: pa.Table) -> pa.Table:
        # band rows carry only (band_id, band_hash, doc_id) — NOT the 64-int
        # signature; that keeps the groupby shuffle 64x smaller.  Candidate
        # verification fetches signatures in a second, filtered pass.
        # band_hash is a vectorized FNV-style fold over the band's signature
        # lanes (arithmetic is deterministic across processes; a rare
        # collision only ADDS a candidate, which verification then rejects —
        # it can never hide a true near-dup pair).
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "band_hash": pa.array([], pa.int64()),
                    "doc_id": batch.column("doc_id"),
                }
            )
        mat = np.stack(
            [np.asarray(s, dtype=np.uint64) for s in batch.column("minhash").to_pylist()]
        )
        fnv = np.uint64(1099511628211)
        hashes = np.empty((n, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                # band_id is mixed into the seed, so the single int64 hash IS
                # the (band, slice) bucket key — half the shuffle payload of a
                # (band_id, band_hash) composite key
                h = np.full(n, np.uint64(1469598103934665603) ^ np.uint64(b))
                for r in range(rows_per_band):
                    h = (h ^ mat[:, b * rows_per_band + r]) * fnv
                hashes[:, b] = h
        return pa.table(
            {
                "band_hash": pa.array(hashes.reshape(-1).view(np.int64), pa.int64()),
                "doc_id": batch.column("doc_id").take(
                    pa.array(np.repeat(np.arange(n), bands), pa.int64())
                ),
            }
        )

    # materialized: consumed twice (partial counts, then the survivor scan) —
    # without pinning, each consumer would re-run the band-hash fold
    buckets = sigs.map_batches(_explode, batch_format="pyarrow").materialize()

    # Bucket keys are int64 hashes: per-block PARTIAL counts (np.unique — a
    # combiner) are a few bytes per distinct key, so below the threshold the
    # duplicate-key set is found by merging partials on the driver with NO
    # shuffle; past it (billions of distinct band hashes) the identical
    # computation runs as a distributed groupby Count reduce.
    def _partial_counts(t: pa.Table) -> pa.Table:
        keys, cnt = np.unique(
            t.column("band_hash").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"band_hash": pa.array(keys, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    small_regime = buckets.count() <= driver_merge_max_rows
    if small_regime:
        part = buckets.map_batches(_partial_counts, batch_format="pyarrow").to_pandas()
        tot = part.groupby("band_hash", sort=False)["n"].sum()
        dup_keys = tot.index.to_numpy()[tot.to_numpy() >= 2]
    else:
        from ray.data.aggregate import Sum

        def _only_dups(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if t.num_columns == 0:
                return pa.schema([("band_hash", pa.int64())]).empty_table()
            keep = t.filter(pc.greater_equal(t.column("n"), pa.scalar(2)))
            return pa.table({"band_hash": keep.column("band_hash")})

        # combiner partials first, then a C-path Sum groupby; only the
        # (rare) duplicate keys come back to the driver
        dup_keys = (
            buckets.map_batches(_partial_counts, batch_format="pyarrow")
            .groupby("band_hash")
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(_only_dups, batch_format="pyarrow")
            .to_pandas()["band_hash"]
            .to_numpy()
        )
    if len(dup_keys) == 0:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({"a": [], "b": [], "est_jaccard": []}))
    dup_set = pa.array(np.sort(dup_keys), pa.int64())

    def _keep_dup(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column("band_hash"), value_set=dup_set))

    surv_ds = buckets.map_batches(_keep_dup, batch_format="pyarrow")
    if not small_regime:
        # the 100 TB regime: pair generation AND verification stay
        # distributed — the driver never sees band rows, candidate pairs, or
        # signatures (same threshold as the bucket-count path; pinned equal
        # to the driver path by the forced-path equivalence test)
        return _minhash_verify_distributed(surv_ds, sigs, threshold)
    # small regime: the surviving band rows are only the actual near-dup
    # buckets — a sliver of the corpus — so pair generation is a local pandas
    # groupby on the driver
    surv = surv_ds.to_pandas()
    pair_rows: list[tuple] = []
    for _, g in surv.groupby("band_hash", sort=False):
        ids = sorted(set(g["doc_id"]))
        pair_rows.extend(
            (ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))
        )
    cand = (
        pd.DataFrame(pair_rows, columns=["a", "b"])
        .drop_duplicates(["a", "b"])
        .reset_index(drop=True)
    )
    if len(cand) == 0:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({"a": [], "b": [], "est_jaccard": []}))
    # verification: signatures of exactly the candidate ids (candidates are
    # rare by construction; for adversarial corpora hash-join pairs to the
    # signature table instead)
    need = set(cand["a"]) | set(cand["b"])

    need_arr = pa.array(sorted(need))

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("doc_id"), value_set=need_arr))

    sig_pd = sigs.map_batches(_filter, batch_format="pyarrow").to_pandas()
    smap = {d: np.asarray(s) for d, s in zip(sig_pd["doc_id"], sig_pd["minhash"])}
    est = [
        float(np.mean(smap[a] == smap[b])) for a, b in zip(cand["a"], cand["b"])
    ]
    cand = cand.assign(est_jaccard=est)
    cand = cand[cand["est_jaccard"] >= threshold].reset_index(drop=True)
    import ray.data as rd

    return rd.from_pandas(cand)


def _minhash_verify_distributed(surv_ds, sigs, threshold: float, num_parts: int = 64):
    """At-scale MinHash candidate pair generation + verification.

    Pair generation: hash-partition surviving band rows on ``band_hash`` (a
    bucket never splits across partitions) and resolve every bucket in one
    vectorized self-merge per PARTITION; global pair dedup is a C-path Count
    groupby over (a, b) — pairs, not band rows, shuffle.

    Verification: a co-partitioned hash join of pair-side rows against the
    signature table on doc key (signatures are SHARDED across partitions,
    never broadcast and never collected), then one pair-key shuffle where
    each pair's two signatures meet; the estimated Jaccard is a single
    matrix comparison per partition.  est = (#equal lanes)/num_hashes is an
    exact binary fraction, so both regimes agree bit-for-bit.
    """
    import ray.data as rd
    from ray.data.aggregate import Count

    from .grouping import partitioned_apply

    _EMPTY = pd.DataFrame(
        {
            "a": pd.Series([], dtype="int64"),
            "b": pd.Series([], dtype="int64"),
            "est_jaccard": pd.Series([], dtype="float64"),
        }
    )

    def _gen(part: pd.DataFrame) -> pd.DataFrame:
        d = part.drop_duplicates(["band_hash", "doc_id"])[["band_hash", "doc_id"]]
        m = d.merge(d, on="band_hash")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m.rename(columns={"doc_id_x": "a", "doc_id_y": "b"})
        return out[["a", "b"]].drop_duplicates()

    pairs = (
        partitioned_apply(surv_ds, "band_hash", _gen, num_parts=num_parts)
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )
    if pairs.count() == 0:
        return rd.from_pandas(_EMPTY)

    # union-merge: each pair emits one row per side keyed by that side's doc
    # id; signature rows carry the real payload.  Schemas line up so the two
    # streams co-partition on "key" in a single shuffle.
    def _sides(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat(
            [df.assign(key=df["a"]), df.assign(key=df["b"])], ignore_index=True
        )
        out["minhash"] = [[]] * len(out)
        out["is_sig"] = np.int8(0)
        return out[["key", "a", "b", "minhash", "is_sig"]]

    def _sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "key": df["doc_id"].to_numpy(),
                "a": np.full(len(df), -1, dtype=np.int64),
                "b": np.full(len(df), -1, dtype=np.int64),
                "minhash": df["minhash"].to_numpy(),
                "is_sig": np.full(len(df), 1, dtype=np.int8),
            }
        )
        return out

    def _attach(part: pd.DataFrame) -> pd.DataFrame:
        side = part[part["is_sig"] == 0]
        sig = part[part["is_sig"] == 1]
        m = side[["key", "a", "b"]].merge(
            sig[["key", "minhash"]], on="key", how="inner"
        )
        return m[["a", "b", "minhash"]]

    def _est(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return _EMPTY
        part = part.sort_values(["a", "b"], kind="mergesort").reset_index(drop=True)
        av = part["a"].to_numpy()
        bv = part["b"].to_numpy()
        # every pair carries exactly two signature rows (one per side)
        assert len(part) % 2 == 0 and (av[0::2] == av[1::2]).all() and (
            bv[0::2] == bv[1::2]
        ).all(), "pair missing a signature side"
        mat = np.vstack([np.asarray(s, dtype=np.uint64) for s in part["minhash"]])
        est = (mat[0::2] == mat[1::2]).mean(axis=1)
        out = pd.DataFrame(
            {"a": av[0::2].astype(np.int64), "b": bv[0::2].astype(np.int64), "est_jaccard": est}
        )
        return out[out["est_jaccard"] >= threshold]

    attached = partitioned_apply(
        pairs.map_batches(_sides, batch_format="pandas").union(
            sigs.map_batches(_sig_rows, batch_format="pandas")
        ),
        "key",
        _attach,
        num_parts=num_parts,
    )
    return partitioned_apply(attached, ["a", "b"], _est, num_parts=num_parts)


class SimHasher:
    """64-bit SimHash over token hashes (actor; token->hash cache is
    per-actor state — natural-language token vocabularies are small relative
    to the corpus, so only first-seen tokens pay a blake2b call).

    Fully vectorized accumulate, byte-identical to the per-row form:
    tokenization via ``pc.split_pattern`` (C path), one ``np.unique`` over
    the batch's tokens, the +/-1 bit matrix expanded from cached uint64
    hashes with a single ``np.unpackbits``, per-doc sums via ``np.add.at``
    over the doc index, and the 64 sign bits reassembled with one shifted
    matmul-free reduction — no Python per row or per bit."""

    def __init__(self):
        self._hash_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        if n == 0:
            return pa.table(
                {"doc_id": batch.column("doc_id"), "simhash": pa.array([], pa.int64())}
            )
        tok_lists = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(tok_lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        counts = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n), counts)
        keep = pc.not_equal(flat, pa.scalar(""))
        doc_idx = doc_idx[keep.to_numpy(zero_copy_only=False)]
        # token identity stays in Arrow: dictionary_encode is the C-path
        # unique+codes (materializing the token column as Python/numpy object
        # strings dominated the whole kernel — 1M tokens = 1M PyObjects);
        # only the (small, cached) dictionary of DISTINCT tokens crosses
        # into Python for hashing.
        enc = pc.dictionary_encode(flat.filter(keep))
        # sign(sum of +/-1 per bit) == (2 * ones_count > token_count): keep
        # the bit matrix uint8 (0/1, 64 B per token) and segment-sum it with
        # ONE np.add.reduceat per batch (doc_idx is sorted by construction)
        # — np.add.at on a +/-1 int64 matrix was 8x the temp memory and an
        # unbuffered scatter.
        pos_bit = np.zeros((n, 64), dtype=bool)
        if len(enc):
            codes = enc.indices.to_numpy(zero_copy_only=False)
            uniq = enc.dictionary.to_pylist()
            hashes = np.empty(len(uniq), dtype=np.uint64)
            cache = self._hash_cache
            for i, w in enumerate(uniq):
                h = cache.get(w)
                if h is None:
                    h = _stable_hash64(w)
                    if len(cache) < 2_000_000:
                        cache[w] = h
                hashes[i] = h
            raw = np.unpackbits(
                hashes.astype("<u8").view(np.uint8).reshape(-1, 8), axis=1
            )
            cnt = np.bincount(doc_idx, minlength=n)
            nz = cnt > 0
            offsets = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            ones = np.add.reduceat(
                raw[codes], offsets[nz], axis=0, dtype=np.int64
            )
            pos_bit[nz] = 2 * ones > cnt[nz, None]
        pos = pos_bit.astype(np.uint64)
        u = (pos << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
        prints = (u ^ np.uint64(1 << 63)).view(np.int64)  # == sim - 2^63
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(prints, pa.int64()),
            }
        )


def simhash_pairs(docs, max_hamming: int = 3, concurrency: int = 4):
    """SimHash near-dup pairs via 4x16-bit band blocking + exact hamming
    verification inside each block."""
    sigs = docs.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, concurrency))

    def _explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sims = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.int64)
        u = sims.view(np.uint64) ^ np.uint64(1 << 63)  # == sim + 2^63
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
        keys = ((u[:, None] >> shifts) & np.uint64(0xFFFF)).reshape(-1)
        take_idx = pa.array(np.repeat(np.arange(n), 4), pa.int64())
        return pa.table(
            {
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_key": pa.array(keys.astype(np.int64), pa.int64()),
                "doc_id": batch.column("doc_id").take(take_idx),
                "simhash": pa.array(np.repeat(sims, 4), pa.int64()),
            }
        )

    buckets = sigs.map_batches(_explode, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        return hamming_pairs_frame(g, "doc_id", "simhash", max_hamming)

    from ray.data.aggregate import Min

    from .grouping import hamming_pairs_frame, partitioned_map_groups

    pairs = partitioned_map_groups(buckets, ["band_id", "band_key"], _pairs)
    # cross-band dedup via the C-path Min aggregate (hamming is identical
    # for every copy of a pair, so Min is the identity)
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


def ngram_jaccard_verify(
    docs, candidate_pairs, shingle_k: int = 3, broadcast_max_pairs: int = 5_000_000
):
    """Exact n-gram Jaccard for candidate pairs — fully distributed.

    Each pair emits one side row per doc key; shingle-set rows for candidate
    docs join the sides via a co-partitioned union merge on doc key (no
    driver shingle map), then one pair-key shuffle brings each pair's two
    shingle sets together and a vectorized explode+groupby computes
    |intersection| / |union| per partition.  Below ``broadcast_max_pairs``
    the candidate id set broadcasts so the shingle pass PRUNES at the read
    (``pc.is_in`` — the common LSH case); above it every doc is shingled in
    one streaming pass (the prune itself would need a join).
    Output: (a, b, jaccard); pairs whose docs are missing/empty get 0.0.
    """
    import ray.data as rd

    from .grouping import partitioned_apply

    cands = candidate_pairs.select_columns(["a", "b"]).materialize()
    n_pairs = cands.count()
    _EMPTY = pd.DataFrame(
        {
            "a": pd.Series([], dtype="int64"),
            "b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        }
    )
    if n_pairs == 0:
        return rd.from_pandas(_EMPTY)

    if n_pairs <= broadcast_max_pairs:
        cand_ids = cands.to_pandas()
        need_arr = pa.array(
            np.unique(np.concatenate([cand_ids["a"].to_numpy(), cand_ids["b"].to_numpy()]))
        )
    else:
        need_arr = None

    def _sets(batch: pa.Table) -> pa.Table:
        if need_arr is not None:
            batch = batch.filter(pc.is_in(batch.column("doc_id"), value_set=need_arr))
        texts = batch.column("text").to_pylist()
        sh = [sorted(set(_shingles(t, shingle_k))) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shingles": pa.array(sh, pa.list_(pa.string())),
            }
        )

    def _sides(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat(
            [df.assign(key=df["a"]), df.assign(key=df["b"])], ignore_index=True
        )
        out["shingles"] = [[]] * len(out)
        out["is_doc"] = np.int8(0)
        return out[["key", "a", "b", "shingles", "is_doc"]]

    def _doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["doc_id"].to_numpy(),
                "a": np.full(len(df), -1, dtype=np.int64),
                "b": np.full(len(df), -1, dtype=np.int64),
                "shingles": df["shingles"].to_numpy(),
                "is_doc": np.full(len(df), 1, dtype=np.int8),
            }
        )

    def _attach(part: pd.DataFrame) -> pd.DataFrame:
        side = part[part["is_doc"] == 0]
        doc = part[part["is_doc"] == 1]
        # LEFT merge: a pair whose doc is missing keeps its side row (with
        # an empty set), so it still reaches the output with jaccard 0.0
        m = side[["key", "a", "b"]].merge(
            doc[["key", "shingles"]], on="key", how="left"
        )
        miss = m["shingles"].isna()
        if miss.any():
            m.loc[miss, "shingles"] = pd.Series(
                [[]] * int(miss.sum()), index=m.index[miss]
            )
        return m[["a", "b", "shingles"]]

    def _jaccard(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return _EMPTY
        anchor = part[["a", "b"]].drop_duplicates()
        ex = part.explode("shingles").dropna(subset=["shingles"])
        if ex.empty:
            out = anchor.copy()
            out["jaccard"] = 0.0
            return out
        # per (pair, shingle): appears in 1 doc -> union only, in 2 -> also
        # intersection (shingle lists are per-doc distinct by construction)
        cnt = ex.groupby(["a", "b", "shingles"], sort=False).size().reset_index(name="k")
        cnt["is2"] = (cnt["k"] == 2).astype(np.int64)
        stats = (
            cnt.groupby(["a", "b"], sort=False)
            .agg(union=("k", "size"), inter=("is2", "sum"))
            .reset_index()
        )
        stats["jaccard"] = stats["inter"].to_numpy() / stats["union"].to_numpy()
        out = anchor.merge(stats[["a", "b", "jaccard"]], on=["a", "b"], how="left")
        out["jaccard"] = out["jaccard"].fillna(0.0)
        return out

    attached = partitioned_apply(
        cands.map_batches(_sides, batch_format="pandas").union(
            docs.map_batches(_sets, batch_format="pyarrow").map_batches(
                _doc_rows, batch_format="pandas"
            )
        ),
        "key",
        _attach,
    )
    return partitioned_apply(attached, ["a", "b"], _jaccard)


def ngram_jaccard_adjacent(docs, shingle_k: int = 3):
    """Exact n-gram Jaccard for every CONSECUTIVE doc-id pair (d, d+1) — the
    deterministic, SQL-oracle-checkable face of the Jaccard verifier (the
    LSH-candidate variant :func:`ngram_jaccard_verify` is rows-only because
    its candidate set comes from hashing).

    Distribution: each doc is replicated to at most 2 pair keys (as right
    member of pair d-1 and left member of pair d) — bounded 2x, one hash
    shuffle on the pair key, each group resolved locally.  Output
    (a, b, jaccard); both sides divide the same small integers, so the
    doubles match bit-for-bit UNROUNDED (rounding would actually break
    parity: Python round() is banker's, DuckDB ROUND is half-away).
    """

    def _rep(batch: pa.Table) -> pa.Table:
        # pair keys are doc_id arithmetic (d-1/d): integer ids only — a
        # string id column would silently produce garbage pairs
        assert pa.types.is_integer(batch.column("doc_id").type), (
            "ngram_jaccard_adjacent requires integer doc_id; got "
            f"{batch.column('doc_id').type}"
        )
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        sh = [sorted(set(_shingles(t, shingle_k))) for t in texts]
        return pa.table(
            {
                "pair_id": pa.array(np.concatenate([ids, ids - 1]), pa.int64()),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(len(ids), dtype=np.int8), np.ones(len(ids), dtype=np.int8)]
                    )
                ),
                "shingles": pa.array(sh + sh, pa.list_(pa.string())),
            }
        )

    reps = docs.map_batches(_rep, batch_format="pyarrow")

    def _jac(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
                 "jaccard": pd.Series([], dtype="float64")}
            )
        pid = int(g["pair_id"].iloc[0])
        sa = set(left["shingles"].iloc[0])
        sb = set(right["shingles"].iloc[0])
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        return pd.DataFrame({"a": [pid], "b": [pid + 1], "jaccard": [j]})

    from .grouping import partitioned_map_groups

    return partitioned_map_groups(reps, "pair_id", _jac, num_parts=32).sort("a")


def embedding_neardup_pairs(embeds, threshold: float = 0.95, planes: int = 16, seed: int = 3):
    """Embedding-cosine near-dup via random-hyperplane LSH blocking + exact
    cosine verification per bucket.

    embeds: Dataset(vec_id, embedding list<float>).  Output (a, b, cosine).
    """

    class Planer:
        def __init__(self):
            self.rng_planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table(
                    {
                        "vec_id": batch.column("vec_id"),
                        "bucket": pa.array([], pa.int64()),
                        "normed": pa.array([], pa.list_(pa.float64())),
                    }
                )
            emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            if self.rng_planes is None:
                rng = np.random.RandomState(seed)
                self.rng_planes = rng.randn(emb.shape[1], planes)
            bits = (emb @ self.rng_planes) > 0
            keys = (bits * (1 << np.arange(planes))).sum(axis=1).astype(np.int64)
            norm = np.linalg.norm(emb, axis=1)
            normed = emb / np.maximum(norm[:, None], 1e-12)
            return pa.table(
                {
                    "vec_id": batch.column("vec_id"),
                    "bucket": pa.array(keys),
                    "normed": pa.array(normed.tolist(), pa.list_(pa.float64())),
                }
            )

    bucketed = embeds.map_batches(Planer, batch_format="pyarrow", concurrency=(1, 4))

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        g = g.sort_values("vec_id")
        ids = list(g["vec_id"])
        mat = np.array([np.array(v) for v in g["normed"]])
        if len(ids) >= 2:
            sims = mat @ mat.T
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if sims[i, j] >= threshold:
                        rows.append(
                            {"a": ids[i], "b": ids[j], "cosine": float(sims[i, j])}
                        )
        return pd.DataFrame(rows, columns=["a", "b", "cosine"])

    from .grouping import partitioned_map_groups

    return partitioned_map_groups(bucketed, "bucket", _pairs)


def dedup_resolve(pairs, driver_max_pairs: int = 5_000_000, max_iters: int = 50):
    """Near-dup pairs -> keep/drop decisions via connected components.

    A pair list alone doesn't dedup a corpus: transitive near-dups (a~b,
    b~c) must collapse to ONE survivor even when (a, c) was never a
    candidate.  Components get the min doc id as label; that doc is kept,
    every other member dropped.

    Two regimes by pair count: below ``driver_max_pairs`` a driver-side
    union-find with path compression (exact, O(pairs * alpha)); above it
    distributed min-label propagation — each round co-partitions the
    (node, nbr) edge rows with the current labels on node, ships
    (nbr, label) proposals through one C-path Min groupby, and converges
    when the monotone label sum stops decreasing (a driver SCALAR per
    round, never the label table).  Rounds needed = component diameter,
    which for near-dup clusters is small.  Paths are pinned equal by a
    forced-path test.

    Output: (doc_id, component, keep) for every doc appearing in a pair;
    docs in no pair are trivially their own component and are omitted.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    from .grouping import partitioned_apply

    _EMPTY = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "component": pd.Series([], dtype="int64"),
            "keep": pd.Series([], dtype="bool"),
        }
    )
    pairs = pairs.select_columns(["a", "b"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_pandas(_EMPTY)

    if n_pairs <= driver_max_pairs:
        pp = pairs.to_pandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.setdefault(r, r) != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(pp["a"], pp["b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                # union by min: smaller id becomes the root
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = pd.DataFrame(
            {
                "doc_id": np.array(sorted(parent), dtype=np.int64),
            }
        )
        out["component"] = np.array(
            [find(int(d)) for d in out["doc_id"]], dtype=np.int64
        )
        out["keep"] = out["doc_id"].to_numpy() == out["component"].to_numpy()
        return rd.from_pandas(out)

    # ---- distributed min-label propagation ----
    def _undirect(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]).astype(np.int64),
                "nbr": np.concatenate([df["b"].to_numpy(), df["a"].to_numpy()]).astype(np.int64),
            }
        )

    edges = pairs.map_batches(_undirect, batch_format="pandas").materialize()
    # init: label(x) = min(x, min neighbor)
    labels = (
        edges.union(
            edges.map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["node"].to_numpy(), "nbr": df["node"].to_numpy()}
                ),
                batch_format="pandas",
            )
        )
        .groupby("node")
        .aggregate(Min("nbr", alias_name="label"))
        .materialize()
    )

    def _lab_sum(ds) -> int:
        from ray.data.aggregate import Sum

        row = ds.aggregate(Sum("label", alias_name="s"))
        return int(row["s"])

    prev_sum = _lab_sum(labels)
    for _ in range(max_iters):
        ed = edges.map_batches(
            lambda df: df.assign(label=np.int64(-1), is_lab=np.int8(0)),
            batch_format="pandas",
        )
        lb = labels.map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"].to_numpy(),
                    "nbr": np.full(len(df), -1, dtype=np.int64),
                    "label": df["label"].to_numpy(),
                    "is_lab": np.full(len(df), 1, dtype=np.int8),
                }
            ),
            batch_format="pandas",
        )

        def _propose(part: pd.DataFrame) -> pd.DataFrame:
            lab = part[part["is_lab"] == 1][["node", "label"]]
            edge = part[part["is_lab"] == 0][["node", "nbr"]]
            # a node proposes its label to every neighbor AND re-proposes it
            # to itself (labels only ever decrease)
            m = edge.merge(lab, on="node", how="inner")
            prop = pd.DataFrame(
                {
                    "node": np.concatenate(
                        [m["nbr"].to_numpy(), lab["node"].to_numpy()]
                    ),
                    "label": np.concatenate(
                        [m["label"].to_numpy(), lab["label"].to_numpy()]
                    ),
                }
            )
            return prop

        labels = (
            partitioned_apply(ed.union(lb), "node", _propose)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur = _lab_sum(labels)
        if cur == prev_sum:
            break
        prev_sum = cur

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df["node"].to_numpy().astype(np.int64),
                "component": df["label"].to_numpy().astype(np.int64),
            }
        )
        out["keep"] = out["doc_id"].to_numpy() == out["component"].to_numpy()
        return out

    return labels.map_batches(_finish, batch_format="pandas").sort("doc_id")


def dedup_resolve_runs(docs):
    """Oracle-checkable face of :func:`dedup_resolve`: the edge set links
    CONSECUTIVE doc ids that share a lang, so components are the maximal
    same-lang id runs — deterministic, non-trivial transitive chains that
    DuckDB recomputes with a recursive closure CTE (real near-dup edges come
    from MinHash, which isn't SQL-derivable; that variant is rows-only and
    pinned by the forced-path test).

    Edge derivation is distribution-safe: each doc replicates to its two
    flanking pair keys (the :func:`ngram_jaccard_adjacent` pattern), one
    hash shuffle, and a vectorized per-partition side merge — no assumption
    that neighbors share a block.  Output (doc_id, component, keep)."""
    from .grouping import partitioned_apply

    def _rep(batch: pa.Table) -> pa.Table:
        assert pa.types.is_integer(batch.column("doc_id").type)
        ids = batch.column("doc_id").to_numpy()
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        n = len(ids)
        return pa.table(
            {
                "pair_id": pa.array(np.concatenate([ids, ids - 1]), pa.int64()),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(n, dtype=np.int8), np.ones(n, dtype=np.int8)]
                    )
                ),
                "lang": pa.array(np.concatenate([langs, langs]), pa.string()),
            }
        )

    def _edges_part(part: pd.DataFrame) -> pd.DataFrame:
        s0 = part[part["side"] == 0][["pair_id", "lang"]]
        s1 = part[part["side"] == 1][["pair_id", "lang"]]
        m = s0.merge(s1, on="pair_id")
        m = m[m["lang_x"] == m["lang_y"]]
        return pd.DataFrame(
            {
                "a": m["pair_id"].to_numpy().astype(np.int64),
                "b": (m["pair_id"].to_numpy() + 1).astype(np.int64),
            }
        )

    pairs = partitioned_apply(
        docs.map_batches(_rep, batch_format="pyarrow"), "pair_id", _edges_part
    )
    return dedup_resolve(pairs)


# ---------------------------------------------------------------------------
# Benchmark decontamination + sub-document (chunk) dedup
# ---------------------------------------------------------------------------

_POLY_P = np.uint64(0x100000001B3)  # FNV-1a prime, used as polynomial base


def _flat_token_hashes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, token_hash) for every non-empty whitespace token of a batch,
    in document order.  Tokens never become per-row Python strings:
    ``dictionary_encode`` is the C-path unique+codes, so only the (small)
    DISTINCT vocabulary crosses into Python for blake2b hashing — the same
    trick the SimHash stage uses (:class:`_SimHasher`)."""
    n = len(batch)
    tok_lists = pc.split_pattern(batch.column("text"), pattern=" ")
    flat = pc.list_flatten(tok_lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    counts = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(n), counts)
    keep = pc.not_equal(flat, pa.scalar(""))
    doc_idx = doc_idx[keep.to_numpy(zero_copy_only=False)]
    enc = pc.dictionary_encode(flat.filter(keep))
    if len(enc) == 0:
        return doc_idx, np.empty(0, dtype=np.uint64)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    uniq = enc.dictionary.to_pylist()
    hashes = np.fromiter(
        (_stable_hash64(w) for w in uniq), dtype=np.uint64, count=len(uniq)
    )
    return doc_idx, hashes[codes]


def _poly_pows(k: int) -> np.ndarray:
    pows = np.empty(k, dtype=np.uint64)
    pows[0] = np.uint64(1)
    for i in range(1, k):
        pows[i] = pows[i - 1] * _POLY_P  # uint64 wraparound is the modulus
    return pows


def _window_hashes(
    doc_idx: np.ndarray, tok_h: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Order-dependent hash of every k-token SLIDING window that lies fully
    inside one document: h = sum_j tok_h[i+j] * P^j (mod 2^64).  k vectorized
    multiply-adds over uint64 lanes — no per-window Python, no (n, k) temp."""
    n = len(tok_h)
    if n < k:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    pows = _poly_pows(k)
    n_win = n - k + 1
    h = np.zeros(n_win, dtype=np.uint64)
    for j in range(k):
        h += tok_h[j : j + n_win] * pows[j]
    valid = doc_idx[:n_win] == doc_idx[k - 1 :]
    return doc_idx[:n_win][valid], h[valid]


def decontaminate(docs, bench_mod: int = 97, shingle_k: int = 8):
    """Benchmark decontamination: flag corpus documents that share any
    ``shingle_k``-token shingle with the held-out benchmark subset
    (deterministically ``doc_id % bench_mod == 0`` here — a stand-in for an
    eval-set table).  Output: (doc_id, n_hits) for EVERY non-benchmark doc —
    n_hits = number of DISTINCT benchmark shingles it contains, 0 when clean
    (a per-doc contamination score the downstream filter thresholds on) —
    sorted by doc_id.

    100 TB design: the benchmark side of a decontamination job is tiny
    (eval sets are MBs; the corpus is the 100 TB side), so the benchmark
    shingle-hash set is collected once, ``ray.put`` once and probed with a
    binary search inside every ``map_batches`` task — the corpus side
    streams with NO shuffle and NO join.  Shingle identity is a 64-bit
    polynomial token-hash fold (collision odds ~n^2/2^64 — negligible
    against the exact-string SQL oracle at any testable scale)."""
    import ray

    def _bench(batch: pa.Table) -> pa.Table:
        # no modulo kernel in Arrow 16 — numpy on the zero-copy int column
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        sub = batch.filter(pa.array(ids % bench_mod == 0))
        if len(sub) == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        doc_idx, tok_h = _flat_token_hashes(sub)
        _, wh = _window_hashes(doc_idx, tok_h, shingle_k)
        return pa.table({"h": pa.array(np.unique(wh), pa.uint64())})

    bench_pd = docs.map_batches(_bench, batch_format="pyarrow").to_pandas()
    bench = np.unique(bench_pd["h"].to_numpy(dtype=np.uint64))
    bench_ref = ray.put(bench)  # plasma-shared; read zero-copy per task

    def _scan(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        sub = batch.filter(pa.array(ids % bench_mod != 0))
        n_hits = np.zeros(len(sub), dtype=np.int64)
        bset = ray.get(bench_ref)
        if len(sub) and len(bset):
            doc_idx, tok_h = _flat_token_hashes(sub)
            widx, wh = _window_hashes(doc_idx, tok_h, shingle_k)
            if len(wh):
                pos = np.searchsorted(bset, wh)
                pos[pos == len(bset)] = 0
                hit = bset[pos] == wh
                widx, wh = widx[hit], wh[hit]
            if len(wh):
                # distinct (doc, shingle): sort by (doc, hash), keep firsts
                order = np.lexsort((wh, widx))
                widx, wh = widx[order], wh[order]
                first = np.r_[
                    True, (widx[1:] != widx[:-1]) | (wh[1:] != wh[:-1])
                ]
                n_hits += np.bincount(widx[first], minlength=len(sub))
        return pa.table(
            {
                "doc_id": pc.cast(sub.column("doc_id"), pa.int64()),
                "n_hits": pa.array(n_hits),
            }
        )

    return docs.map_batches(_scan, batch_format="pyarrow").sort("doc_id")


def chunk_dedup(docs, chunk_tokens: int = 10):
    """Sub-document dedup: split each doc into consecutive NON-overlapping
    ``chunk_tokens``-token chunks (the single-line analog of paragraph-level
    dedup) and mark, for every chunk, whether this (doc_id, pos) is the
    globally FIRST occurrence of that chunk's content (order: doc_id, then
    position).  Output: (doc_id, pos, is_first) sorted by (doc_id, pos).

    Shuffle discipline: the corpus text never moves — only (chunk_hash,
    doc_id, pos) triples shuffle, one coarse hash partition on chunk_hash,
    then a whole-partition sort + duplicated() resolves first-occurrence
    with no per-group Python (:func:`grouping.partitioned_apply`).  Chunk
    identity is the position-weighted polynomial fold of
    :func:`_window_hashes` restricted to chunk boundaries."""

    def _chunks(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "chunk_h": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            }
        )
        doc_idx, tok_h = _flat_token_hashes(batch)
        if len(tok_h) == 0:
            return empty
        # position of each token within its doc
        starts = np.flatnonzero(np.r_[True, np.diff(doc_idx) != 0])
        counts = np.diff(np.r_[starts, len(doc_idx)])
        pos_in_doc = np.arange(len(doc_idx)) - np.repeat(starts, counts)
        cpos = pos_in_doc % chunk_tokens
        cidx = pos_in_doc // chunk_tokens
        pows = _poly_pows(chunk_tokens)
        contrib = tok_h * pows[cpos]
        # tokens are sorted by (doc, pos) => chunk boundaries are where
        # cpos resets; one uint64 reduceat per batch
        bounds = np.flatnonzero(np.r_[True, cpos[1:] == 0])
        ch = np.add.reduceat(contrib, bounds)
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        return pa.table(
            {
                "chunk_h": pa.array(ch.view(np.int64)),
                "doc_id": pa.array(ids[doc_idx[bounds]]),
                "pos": pa.array(cidx[bounds].astype(np.int64)),
            }
        )

    rows = docs.map_batches(_chunks, batch_format="pyarrow")

    def _first(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["chunk_h", "doc_id", "pos"], kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": part["doc_id"].to_numpy().astype(np.int64),
                "pos": part["pos"].to_numpy().astype(np.int64),
                "is_first": (~part["chunk_h"].duplicated(keep="first"))
                .to_numpy()
                .astype(np.int64),
            }
        )

    from .grouping import partitioned_apply

    return partitioned_apply(rows, "chunk_h", _first, num_parts=64).sort(
        ["doc_id", "pos"]
    )


def keep_best(
    docs,
    key_cols=("lang", "source"),
    score_col: str = "n_chars",
    id_col: str = "doc_id",
):
    """Argmax-per-group canonical selection: within each key group keep the
    row with the highest score, tie -> smallest id — the "keep the best
    duplicate" step every dedup pipeline ends with (run it over
    ``content_hash`` / MinHash cluster ids for real dedup; the default keys
    exercise multi-member groups on the testdata corpus).

    Unlike grouped top-k (sort shuffle + partition scan), the argmax here is
    a pure COMBINER: (score, id) packs into ONE int64 — ``score << 31 |
    (2^31-1 - id)`` — so a plain ``groupby().aggregate(Max)`` resolves both
    the winner and its tie-break in a single pre-combined C-path pass; the
    shuffle carries one row per (batch, group).  At 100 TB nothing but the
    packed partials moves.  Unpack runs distributed after the aggregate.

    Output: key cols + keep_id, best_score, n_members (sorted by keys).
    SQL oracle: ``row_number() OVER (PARTITION BY keys ORDER BY score DESC,
    id) = 1`` + a windowed COUNT(*).
    """
    from ray.data.aggregate import Count, Max

    key_cols = list(key_cols)

    def _pack(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            cols = {k: t.column(k) for k in key_cols}
            cols["packed"] = pa.array([], pa.int64())
            return pa.table(cols)
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy()
        sc = pc.cast(t.column(score_col), pa.int64()).to_numpy()
        # packed argmax needs both halves to fit their fields; explicit
        # raises (not asserts) so python -O can't silently corrupt bits
        if ids.min() < 0 or ids.max() >= (1 << 31):
            raise ValueError("keep_best: id outside packed 31-bit range")
        if sc.min() < 0 or sc.max() >= (1 << 31):
            raise ValueError("keep_best: score outside packed 31-bit range")
        cols = {k: t.column(k) for k in key_cols}
        cols["packed"] = pa.array((sc << 31) | ((1 << 31) - 1 - ids), pa.int64())
        return pa.table(cols)

    agg = (
        docs.map_batches(_pack, batch_format="pyarrow")
        .groupby(key_cols)
        .aggregate(Max("packed", alias_name="packed"), Count(alias_name="n_members"))
    )

    def _unpack(t: pa.Table) -> pa.Table:
        packed = t.column("packed").to_numpy()
        cols = {k: t.column(k) for k in key_cols}
        cols["keep_id"] = pa.array(((1 << 31) - 1) - (packed & ((1 << 31) - 1)), pa.int64())
        cols["best_score"] = pa.array(packed >> 31, pa.int64())
        cols["n_members"] = pc.cast(t.column("n_members"), pa.int64())
        return pa.table(cols)

    return agg.map_batches(_unpack, batch_format="pyarrow").sort(key_cols)


def fuzzy_pairs(ds, col: str = "p_name"):
    """All surface-form pairs within edit distance 1 — the fuzzy face of
    surface canonicalization (spelling variants of the same entity collapse
    before linking; the NER canonicalize stage consumes exactly such pairs).

    FastSS / symmetric-delete blocking, provably complete for d<=1: two
    strings within one edit ALWAYS share a member of their single-deletion
    neighborhoods, so each distinct surface replicates to its L+1 deletion
    variants (one C-path ``str.slice`` concat per position — vectorized over
    the batch, the loop is over string POSITIONS, bounded by max length, not
    rows), candidate pairs form per variant group with a partition-local
    self-merge, and a vectorized byte-matrix check keeps exactly the true
    distance-1 pairs (sharing a variant is necessary, not sufficient —
    e.g. "ab"/"ba" share variants at distance 2).  Every stage is bounded:
    replication by max surface length, groups by variant collisions, verify
    by candidate volume; nothing ever materializes the corpus.  Byte-level
    compare — exact for ASCII surfaces (the oracle's levenshtein is
    char-level; multi-byte UTF-8 would need a codepoint decode first).

    Output: (name_a, name_b) with name_a < name_b, sorted.
    """
    from ray.data.aggregate import Count

    from .grouping import partitioned_apply

    def _distinct(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(t.column(col))})

    names = (
        ds.map_batches(_distinct, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    def _variants(t: pa.Table) -> pa.Table:
        ser = t.column(col).to_pandas().astype(str)
        outs = [pd.DataFrame({"variant": ser, "name": ser})]
        lens = ser.str.len()
        for k in range(int(lens.max()) if len(ser) else 0):
            sub = ser[lens > k]
            outs.append(
                pd.DataFrame(
                    {"variant": sub.str.slice(0, k) + sub.str.slice(k + 1), "name": sub}
                )
            )
        return pa.Table.from_pandas(
            pd.concat(outs, ignore_index=True), preserve_index=False
        )

    var = names.map_batches(_variants, batch_format="pyarrow")

    def _cand(part: pd.DataFrame) -> pd.DataFrame:
        m = part.merge(part, on="variant")
        m = m[m["name_x"] < m["name_y"]]
        return m[["name_x", "name_y"]].drop_duplicates()

    cand = (
        partitioned_apply(var, "variant", _cand)
        .groupby(["name_x", "name_y"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    def _verify(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"name_a": pa.array([], pa.string()), "name_b": pa.array([], pa.string())}
        )
        if len(t) == 0:
            return empty
        x = t.column("name_x").to_pandas().to_numpy(object)
        y = t.column("name_y").to_pandas().to_numpy(object)
        xb = np.array([s.encode() for s in x], dtype=object)
        yb = np.array([s.encode() for s in y], dtype=object)
        # BYTE lengths (a multi-byte char costs several byte edits here —
        # exact for ASCII, conservative otherwise; see docstring)
        lx = np.fromiter((len(s) for s in xb), np.int64, len(xb))
        ly = np.fromiter((len(s) for s in yb), np.int64, len(yb))
        # orient a = shorter, b = longer (output keeps the x/y lexic order)
        swap = lx > ly
        a, b = np.where(swap, yb, xb), np.where(swap, xb, yb)
        la, lb = np.minimum(lx, ly), np.maximum(lx, ly)
        keep_len = (lb - la) <= 1
        w = int(lb.max()) + 1
        A = np.array(list(a), dtype=f"S{w}").view(np.uint8).reshape(len(a), w)
        B = np.array(list(b), dtype=f"S{w}").view(np.uint8).reshape(len(b), w)
        pos = np.arange(w)[None, :]
        same_len = la == lb
        n_mismatch = ((A != B) & (pos < la[:, None])).sum(axis=1)
        ok_sub = same_len & (n_mismatch == 1)
        # deletion case: first mismatch at i, then a[i:] must equal b[i+1:]
        diff = (A != B) & (pos < la[:, None])
        first = np.where(diff.any(axis=1), diff.argmax(axis=1), la)
        Bs = np.zeros_like(B)
        Bs[:, :-1] = B[:, 1:]
        eq_shift = (A == Bs) | (pos >= la[:, None])
        # suffix_all[:, i] == True iff a[i:la] == b[i+1:la+1]
        suffix_all = np.flip(np.cumprod(np.flip(eq_shift, axis=1), axis=1), axis=1).astype(bool)
        padded = np.concatenate([suffix_all, np.ones((len(a), 1), bool)], axis=1)
        ok_del = (~same_len) & keep_len & padded[np.arange(len(a)), first]
        keep = ok_sub | ok_del
        return pa.table(
            {"name_a": pa.array(x[keep], pa.string()), "name_b": pa.array(y[keep], pa.string())}
        )

    return cand.map_batches(_verify, batch_format="pyarrow").sort(["name_a", "name_b"])


def surface_resolution(names, pairs, col: str = "p_name"):
    """End-to-end surface entity resolution: near-match pairs (e.g. from
    :func:`fuzzy_pairs`) collapse transitively into clusters and every
    distinct surface maps to its canonical form (lexicographic minimum of
    its cluster — "old bolt" and "cold bolt" both resolve to "cold bolt").
    This is the surface-canonicalization capstone the NER linker consumes.

    Scale shape: the PAIR set is bounded by true near-matches (tiny next to
    the surface table), so union-find over it runs on the driver exactly
    like :func:`dedup_resolve`'s small regime (the distributed min-label
    propagation there generalizes verbatim to string labels when pairs
    outgrow the driver).  The resulting mapping and the >1 cluster sizes —
    both bounded by pair-touched surfaces — broadcast via ``ray.put``; the
    full surface table streams through one vectorized map that defaults
    untouched surfaces to themselves with size 1.  Nothing corpus-sized
    ever sits on the driver.

    Output: (surface, canonical, cluster_size), sorted by surface.
    """
    import ray

    ppd = pairs.to_pandas()
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(ppd["name_a"], ppd["name_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    canon = {s: find(s) for s in parent}
    sizes: dict[str, int] = {}
    for s, c in canon.items():
        sizes[c] = sizes.get(c, 0) + 1
    ref = ray.put((canon, sizes))

    class _Resolve:
        def __init__(self):
            self.canon, self.sizes = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            s = t.column(col).to_pandas()
            c = s.map(self.canon).fillna(s)
            n = c.map(self.sizes).fillna(1).astype(np.int64)
            return pa.table(
                {
                    "surface": pa.array(s, pa.string()),
                    "canonical": pa.array(c, pa.string()),
                    "cluster_size": pa.array(n.to_numpy(), pa.int64()),
                }
            )

    from ray.data.aggregate import Count

    def _distinct(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(t.column(col))})

    distinct = (
        names.map_batches(_distinct, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    return distinct.map_batches(
        _Resolve, batch_format="pyarrow", concurrency=(1, 4)
    ).sort("surface")


def duplicated_spans(docs, window_tokens: int = 8):
    """Exact duplicated-substring detection — the token-level analog of
    suffix-array exact-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): every sliding
    ``window_tokens``-token window whose content occurs MORE THAN ONCE in
    the corpus (in another doc OR at another position of the SAME doc)
    marks its start position duplicated; per doc, the duplicated window
    intervals ``[pos, pos + W - 1]`` merge into MAXIMAL spans while they
    overlap or touch (merge while ``next_start - prev_start <= W``).
    Output: one row per maximal span — (doc_id, span_start, span_end,
    n_windows), token indices inclusive, sorted by (doc_id, span_start).
    Downstream removal = cut those token ranges (the reference repo has no
    sub-document dedup; this is the engine-new 100-TB face of its exact
    line dedup, ``run_test`` dedup_file semantics at span granularity).

    Shuffle discipline (same as :func:`chunk_dedup`): corpus text never
    moves — only (win_h, doc_id, pos) int64 triples shuffle, ONE coarse
    hash partition on win_h resolves global duplication with a vectorized
    ``duplicated(keep=False)`` over the whole partition frame (no per-group
    Python), then one doc_id partition does the island merge as pure numpy.
    At 100 TB the exchange is ~1 triple per corpus token — the same order
    as the MinHash shingle table; window identity is the position-weighted
    polynomial fold (:func:`_window_hashes`), 2^64 lanes."""
    W = int(window_tokens)

    _EMPTY_WIN = pa.table(
        {
            "win_h": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
        }
    )

    def _wins(batch: pa.Table) -> pa.Table:
        doc_idx, tok_h = _flat_token_hashes(batch)
        if len(tok_h) < W:
            return _EMPTY_WIN
        widx, wh = _window_hashes(doc_idx, tok_h, W)
        if len(wh) == 0:
            return _EMPTY_WIN
        # start position of each window within its doc, aligned with the
        # same validity mask _window_hashes applies
        starts = np.flatnonzero(np.r_[True, np.diff(doc_idx) != 0])
        counts = np.diff(np.r_[starts, len(doc_idx)])
        pos_in_doc = np.arange(len(doc_idx)) - np.repeat(starts, counts)
        n_win = len(doc_idx) - W + 1
        valid = doc_idx[:n_win] == doc_idx[W - 1 :]
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        return pa.table(
            {
                "win_h": pa.array(wh.view(np.int64)),
                "doc_id": pa.array(ids[widx]),
                "pos": pa.array(pos_in_doc[:n_win][valid].astype(np.int64)),
            }
        )

    rows = docs.map_batches(_wins, batch_format="pyarrow")

    _EMPTY_DUP = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "pos": pd.Series([], dtype="int64"),
        }
    )

    def _dups(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return _EMPTY_DUP
        dup = part["win_h"].duplicated(keep=False).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": part["doc_id"].to_numpy()[dup].astype(np.int64),
                "pos": part["pos"].to_numpy()[dup].astype(np.int64),
            }
        )

    from .grouping import partitioned_apply

    dup_pos = partitioned_apply(rows, "win_h", _dups, num_parts=64)

    _EMPTY_SPAN = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "span_start": pd.Series([], dtype="int64"),
            "span_end": pd.Series([], dtype="int64"),
            "n_windows": pd.Series([], dtype="int64"),
        }
    )

    def _spans(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return _EMPTY_SPAN
        part = part.sort_values(["doc_id", "pos"], kind="mergesort")
        d = part["doc_id"].to_numpy().astype(np.int64)
        p = part["pos"].to_numpy().astype(np.int64)
        new = np.r_[True, (d[1:] != d[:-1]) | (p[1:] - p[:-1] > W)]
        bounds = np.flatnonzero(new)
        n_windows = np.diff(np.r_[bounds, len(p)])
        return pd.DataFrame(
            {
                "doc_id": d[bounds],
                "span_start": p[bounds],
                "span_end": p[np.r_[bounds[1:] - 1, len(p) - 1]] + W - 1,
                "n_windows": n_windows.astype(np.int64),
            }
        )

    return partitioned_apply(dup_pos, "doc_id", _spans, num_parts=64).sort(
        ["doc_id", "span_start"]
    )


def incremental_exact_dedup(
    docs,
    state_dir: str,
    split_mod: int = 3,
    num_parts: int = 16,
    key_col: str = "text",
    id_col: str = "doc_id",
):
    """Exact dedup across SEQUENTIAL corpus loads with hash-partitioned
    persisted state — the "dedupe today's crawl against all history"
    shape.  History is NEVER re-read: its entire dedup footprint is the
    (content_hash, keep_id, first_load) state table, partitioned by a
    deterministic hash of content_hash so each new load's membership
    anti-join is co-partitioned BY LAYOUT (a load task reads only its own
    partition's parquet files — zero shuffle of history, state I/O
    proportional to state size / num_parts per task).

    Per load ``i`` (deterministic ``doc_id % split_mod`` split of
    ``docs``, the :func:`textstats.incremental_token_histogram` recipe):

    1. md5 content hash per new doc (the :func:`exact_dedup` contract);
    2. within-load combine: min id per hash, vectorized per partition;
    3. anti-join against the partition's committed state files; survivors
       write ``part=NNNN/load_i.parquet`` via tmp-file + ``os.replace``
       (atomic; task retries overwrite with identical deterministic
       content), so a killed run resumes cleanly;
    4. the load commits to ``_loads.json`` last; committed loads are
       skipped on re-run (the checkpoint-manifest contract).

    Returns the final state as a Dataset (content_hash, keep_id,
    first_load) — keep_id is the minimum id within the FIRST load that saw
    the hash (the streaming-arrival winner, which a full-corpus recompute
    reproduces as the SQL twin's (first_load, min doc) pick).
    """
    import glob
    import json
    import os
    import uuid

    import ray.data as rd

    os.makedirs(state_dir, exist_ok=True)
    manifest = os.path.join(state_dir, "_loads.json")
    committed: list[int] = []
    if os.path.exists(manifest):
        with open(manifest) as f:
            committed = json.load(f)

    def _hash_tag(load_i: int):
        def _f(t: pa.Table) -> pd.DataFrame:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            keep = ids % split_mod == load_i
            texts = t.column(key_col).to_pandas()[keep]
            h = pd.Series(
                [hashlib.md5(x.encode()).hexdigest() for x in texts],
                dtype=object,
            )
            part = (
                pd.util.hash_pandas_object(h, index=False) % num_parts
            ).astype(np.int32)
            return pd.DataFrame(
                {
                    "content_hash": h.to_numpy(),
                    "keep_id": ids[keep],
                    "__part": part.to_numpy(),
                }
            )

        return _f

    def _dedup_part(load_i: int):
        def _f(g: pd.DataFrame) -> pd.DataFrame:
            part = int(g["__part"].iloc[0])
            pdir = os.path.join(state_dir, f"part={part:04d}")
            os.makedirs(pdir, exist_ok=True)
            # within-load combine: min id per hash (C-path)
            cand = (
                g.groupby("content_hash", sort=True)["keep_id"]
                .min()
                .reset_index()
            )
            seen: set[str] = set()
            for fp in glob.glob(os.path.join(pdir, "load_*.parquet")):
                seen.update(
                    pq.read_table(fp, columns=["content_hash"])
                    .column("content_hash")
                    .to_pylist()
                )
            new = cand[~cand["content_hash"].isin(seen)].copy()
            new["first_load"] = np.int64(load_i)
            out = pa.Table.from_pandas(new, preserve_index=False)
            tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
            pq.write_table(out, tmp)
            os.replace(tmp, os.path.join(pdir, f"load_{load_i}.parquet"))
            return new

        return _f

    for i in range(split_mod):
        if i in committed:
            continue
        tagged = docs.map_batches(_hash_tag(i), batch_format="pyarrow")
        # force the load's partition writes to completion before committing
        tagged.groupby("__part").map_groups(
            _dedup_part(i), batch_format="pandas"
        ).materialize()
        committed.append(i)
        tmp = manifest + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(committed, f)
        os.replace(tmp, manifest)

    files = sorted(
        glob.glob(os.path.join(state_dir, "part=*", "load_*.parquet"))
    )
    return (
        rd.read_parquet(files)
        .select_columns(["content_hash", "keep_id", "first_load"])
        .sort(["content_hash"])
    )
