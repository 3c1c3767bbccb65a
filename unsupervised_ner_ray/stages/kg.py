"""Distributed KG stages: entity linking, canonicalization, adjacency.

Shuffle discipline (SURVEY.md §7):
* entity linking  — BROADCAST join: the descriptor vocabulary is ray.put once
                    and read in each actor's __init__; no shuffle.
* canonicalization— two-phase salted aggregate: a per-batch combiner reduces
                    each batch to distinct (surface_norm, etype) partial
                    counts, a salt column splits head surfaces across
                    reducers, then a small groupby merges partials.  The raw
                    mention stream is never shuffled.
* adjacency       — one groupby on subj_id (the only unavoidable wide op),
                    feeding map_groups that emits one adjacency row per
                    entity, neighbors sorted deterministically.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import DEFAULT_CONFIG, PipelineConfig


class EntityLinker:
    """Broadcast-join mentions against the descriptor vocabulary (engine
    analog of the reference's labeled-vocab lookup, D15 + main_NER.py:640-642;
    unlinked mentions mirror the CI-harvest side channel,
    batched_main_NER.py:147-153)."""

    def __init__(self, vocab_ref=None):
        from ..assets import build_vocab

        self.vocab = ray.get(vocab_ref) if vocab_ref is not None else build_vocab()

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch.column("surface_norm").to_pylist()
        linked_types, linked = [], []
        for s in surfaces:
            hit = self.vocab.get(s)
            if hit is None and " " in s:
                for w in s.split():
                    hit = self.vocab.get(w)
                    if hit is not None:
                        break
            if hit is None:
                linked_types.append([])
                linked.append(False)
            else:
                linked_types.append(hit[0])
                linked.append(True)
        return batch.append_column(
            "linked_types", pa.array(linked_types, pa.list_(pa.string()))
        ).append_column("linked", pa.array(linked, pa.bool_()))


def link_mentions(mentions, vocab_ref=None, concurrency: int = 4):
    """mentions Dataset -> + linked_types/linked columns (broadcast join)."""
    return mentions.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"vocab_ref": vocab_ref},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def pagerank(triples, damping: float = 0.85, iters: int = 20, tol: float = 1e-12):
    """PageRank over the (subj_id -> obj_id) triple edges by power
    iteration: each iteration is ONE streaming pass over the edge dataset —
    per-batch contributions are pre-summed per destination (a combiner), the
    rank vector (one float per ENTITY, orders of magnitude smaller than the
    edges) rides the object store via ``ray.put``, and the node-sized merge
    happens on the driver (swap for a groupby-sum reduce when the entity
    count outgrows one machine).  Dangling mass is redistributed uniformly.
    Returns a Dataset (node_id, rank); ranks sum to 1.
    """
    import numpy as np
    import ray.data as rd

    from ray.data.aggregate import Count

    edges_pd_ids = (
        triples.map_batches(
            lambda t: pa.table(
                {"node_id": pa.concat_arrays(
                    [t.column("subj_id").combine_chunks(), t.column("obj_id").combine_chunks()]
                )}
            ),
            batch_format="pyarrow",
        )
        .groupby("node_id")
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    node_ids = sorted(edges_pd_ids["node_id"].tolist())
    n = len(node_ids)
    if n == 0:
        return rd.from_pandas(pd.DataFrame({"node_id": [], "rank": []}))
    idx = {v: i for i, v in enumerate(node_ids)}
    idx_ref = ray.put(idx)

    def _encode(t: pa.Table) -> pa.Table:
        m = ray.get(idx_ref)
        s = [m[v] for v in t.column("subj_id").to_pylist()]
        o = [m[v] for v in t.column("obj_id").to_pylist()]
        return pa.table(
            {"s": pa.array(s, pa.int64()), "o": pa.array(o, pa.int64())}
        )

    enc = triples.map_batches(_encode, batch_format="pyarrow").materialize()
    outdeg = np.zeros(n, dtype=np.float64)
    for b in enc.iter_batches(batch_format="pyarrow"):
        np.add.at(outdeg, b.column("s").to_numpy(), 1.0)

    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        rank_ref = ray.put(rank / np.maximum(outdeg, 1.0))

        def _contrib(t: pa.Table) -> pa.Table:
            w = ray.get(rank_ref)
            acc = np.zeros(n, dtype=np.float64)
            np.add.at(acc, t.column("o").to_numpy(), w[t.column("s").to_numpy()])
            nz = np.nonzero(acc)[0]
            return pa.table(
                {"i": pa.array(nz, pa.int64()), "v": pa.array(acc[nz], pa.float64())}
            )

        parts = enc.map_batches(_contrib, batch_format="pyarrow").to_pandas()
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, parts["i"].to_numpy(), parts["v"].to_numpy())
        dangling = float(rank[outdeg == 0].sum())
        new = (1.0 - damping) / n + damping * (contrib + dangling / n)
        delta = float(np.abs(new - rank).sum())
        rank = new
        if delta < tol:
            break
    return rd.from_pandas(pd.DataFrame({"node_id": node_ids, "rank": rank}))


def link_mentions_shuffled(mentions, vocab: dict | None = None, num_parts: int = 64):
    """Entity linking for a vocabulary too large to broadcast: the SURVEY
    §2.4 "hash shuffle join keyed on normalized surface" path, semantically
    identical to the broadcast :class:`EntityLinker` (exact surface first,
    then the first whitespace word that hits).

    Plan: (1) collapse duplicate mention rows with a C-path Count (identical
    rows link identically); (2) explode each distinct mention into its
    lookup keys with a precedence index (surface_norm=0, word_i=i+1);
    (3) co-partition key rows AND vocab rows on hash(key) and resolve each
    partition with a local dict — vocab is sharded across partitions, never
    replicated; (4) regroup per mention, take the lowest-precedence hit, and
    re-expand the duplicate multiplicity.  Three bounded shuffles, no
    driver-side vocab.
    """
    import numpy as np

    from ray.data.aggregate import Count

    from .grouping import partitioned_map_groups

    if vocab is None:
        from ..assets import build_vocab

        vocab = build_vocab()

    ident = ["doc_id", "span_idx", "surface", "etype", "surface_norm", "eid"]
    distinct = mentions.groupby(ident).aggregate(Count(alias_name="n_copies"))

    def _explode_keys(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = {c: [] for c in [*ident, "n_copies", "key", "prio"]}
        for rec in df.itertuples(index=False):
            d = rec._asdict()
            keys = [(d["surface_norm"], 0)]
            if " " in d["surface_norm"]:
                keys += [(w, i + 1) for i, w in enumerate(d["surface_norm"].split())]
            for key, prio in keys:
                for c in ident:
                    rows[c].append(d[c])
                rows["n_copies"].append(d["n_copies"])
                rows["key"].append(key)
                rows["prio"].append(prio)
        out = pa.table(rows)
        return out.set_column(
            out.schema.get_field_index("prio"),
            "prio",
            pa.array(rows["prio"], pa.int64()),
        )

    keyrows = distinct.map_batches(_explode_keys, batch_format="pyarrow")

    import ray.data as rd

    vocab_df = pd.DataFrame(
        {
            "key": list(vocab.keys()),
            "types_joined": ["/".join(v[0]) for v in vocab.values()],
        }
    )
    vocab_ds = rd.from_pandas(vocab_df)

    def _tag_part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["key"], index=False)
        df = df.copy()
        df["part"] = (h % num_parts).astype("int32")
        return df

    def _vocab_shape(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        for c in ident:
            out[c] = "" if c != "span_idx" else 0
        out["n_copies"] = 0  # marks a vocab row
        out["prio"] = -1
        return out[[*ident, "n_copies", "key", "prio", "types_joined", "part"]]

    km = keyrows.map_batches(_tag_part, batch_format="pandas").map_batches(
        lambda df: df.assign(types_joined=""), batch_format="pandas"
    )
    vm = vocab_ds.map_batches(_tag_part, batch_format="pandas").map_batches(
        _vocab_shape, batch_format="pandas"
    )

    def _resolve(part: pd.DataFrame) -> pd.DataFrame:
        voc = part[part["n_copies"] == 0]
        men = part[part["n_copies"] > 0]
        if men.empty:
            return pd.DataFrame(
                columns=[*ident, "n_copies", "prio", "types_joined", "hit"]
            ).astype({"span_idx": "int64", "n_copies": "int64", "prio": "int64", "hit": "bool"})
        lut = dict(zip(voc["key"], voc["types_joined"]))
        men = men.copy()
        men["types_joined"] = men["key"].map(lambda k: lut.get(k))
        men["hit"] = men["types_joined"].notna()
        return men[[*ident, "n_copies", "prio", "types_joined", "hit"]]

    resolved = (
        km.union(vm)
        .groupby("part")
        .map_groups(_resolve, batch_format="pandas")
    )

    def _pick(g: pd.DataFrame) -> pd.DataFrame:
        hits = g[g["hit"]].sort_values("prio")
        if len(hits):
            tj = hits["types_joined"].iloc[0]
            types = tj.split("/") if tj else []
            linked = True
        else:
            types, linked = [], False
        n = int(g["n_copies"].iloc[0])
        base = {c: [g[c].iloc[0]] * n for c in ident}
        base["linked_types"] = [types] * n
        base["linked"] = [linked] * n
        return pd.DataFrame(base)

    return partitioned_map_groups(resolved, ident, _pick, num_parts=num_parts)


def canonicalize_mentions(
    mentions, config: PipelineConfig = DEFAULT_CONFIG
):
    """Mentions -> canonical entity table.

    Phase 1 (combiner, inside map_batches — no shuffle): per-batch counts per
    (surface_norm, etype); a ``salt`` column hash-splits head keys so no
    single reducer sees all partials of a hot surface.
    Phase 2: groupby(surface_norm, salt) merges within salt buckets, then
    groupby(surface_norm) merges the <= S bucket rows per key — both
    small shuffles over pre-aggregated data.

    Output: eid, surface_norm, surface (most frequent raw form), etype
    (majority vote), n_mentions.
    """
    salt_buckets = config.canon_salt_buckets

    def _combine(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "surface_norm": batch.column("surface_norm").to_pylist(),
                "surface": batch.column("surface").to_pylist(),
                "etype": batch.column("etype").to_pylist(),
            }
        )
        g = (
            df.groupby(["surface_norm", "etype", "surface"], sort=True)
            .size()
            .reset_index(name="n")
        )
        # salt must NOT be a pure function of the key (that would send every
        # partial of a hot surface to the same reducer anyway): it varies per
        # BATCH, so a head surface's partials from different batches land in
        # different (key, salt) buckets and merge in two steps.  Which bucket
        # a partial lands in never affects the final sums.
        _combine.batch_no += 1
        g["salt"] = np.int32(
            (zlib.crc32(str(os.getpid()).encode()) + _combine.batch_no) % salt_buckets
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    _combine.batch_no = 0

    # partials are pre-aggregated (distinct keys per batch) and therefore
    # small; coalesce before the shuffle so the reduce stage doesn't fan out
    # into per-key micro-tasks (at 100 TB the combiner output is still ~the
    # distinct-key count per batch, orders of magnitude below the input)
    partials = mentions.map_batches(_combine, batch_format="pyarrow").repartition(
        max(2, salt_buckets // 2)
    )

    def _merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["surface_norm", "etype", "surface"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        return out

    from .grouping import partitioned_map_groups

    bucketed = partitioned_map_groups(
        partials, ["surface_norm", "salt"], _merge_bucket, num_parts=64
    )

    def _finalize(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.kg import entity_id

        norm = g["surface_norm"].iloc[0]
        n_total = int(g["n"].sum())
        # deterministic majority votes: count desc, then lexicographic
        et = (
            g.groupby("etype")["n"].sum().reset_index()
            .sort_values(["n", "etype"], ascending=[False, True])
        )
        sf = (
            g.groupby("surface")["n"].sum().reset_index()
            .sort_values(["n", "surface"], ascending=[False, True])
        )
        return pd.DataFrame(
            {
                "eid": [entity_id(norm)],
                "surface_norm": [norm],
                "surface": [sf["surface"].iloc[0]],
                "etype": [et["etype"].iloc[0]],
                "n_mentions": [n_total],
            }
        )

    return partitioned_map_groups(bucketed, "surface_norm", _finalize, num_parts=64)


def build_adjacency(triples, reduce_partitions: int = 8):
    """Triples -> adjacency-list graph partitions.

    groupby(subj_id) is the one real all-to-all here; neighbor lists are
    sorted (pred, obj_id) for determinism.  Output one row per subject
    entity: subj_id, subj_norm, degree, neighbors list<struct>.
    ``reduce_partitions`` bounds the shuffle fan-out (scale it with the
    cluster, not with the tiny per-run block count).
    """

    def _adj(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pred", "obj_id", "doc_id"], kind="mergesort")
        neighbors = [
            {"pred": p, "obj_id": oi, "obj_norm": on}
            for p, oi, on in zip(g["pred"], g["obj_id"], g["obj_norm"])
        ]
        return pd.DataFrame(
            {
                "subj_id": [g["subj_id"].iloc[0]],
                "subj_norm": [g["subj_norm"].iloc[0]],
                "degree": [len(neighbors)],
                "neighbors": [neighbors],
            }
        )

    from .grouping import partitioned_map_groups

    return partitioned_map_groups(
        triples, "subj_id", _adj, num_parts=reduce_partitions
    )
