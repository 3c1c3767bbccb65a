"""Ray Data stages for the NER tagging core.

``NerTagger`` is the flagship stateful stage: a callable class used as

    docs.map_batches(NerTagger, batch_format="pyarrow",
                     batch_size=cfg.tagger_batch_size,
                     concurrency=cfg.tagger_concurrency, num_cpus=1)

Both model backends + the entity map + vocabulary are built ONCE per actor in
``__init__`` (the engine analog of the reference's per-process UnsupNER
singleton state, /root/reference/batched_main_NER.py:68-87 and
BatchedNerServer.py:27-29); ``__call__`` tags every text span of every
document in the batch row-locally.  No shuffle is involved anywhere in
tagging — a sentence's masked variants, descriptor predictions, pooling and
BIO emission never leave the row (SURVEY.md §2.5: these are row-local
computations, not distributed aggregations).

The per-sentence work is irreducibly Python (ordered-dict semantics are the
conformance contract), so the batch loop is the vectorization boundary; the
stage scales by data parallelism across actors.

Output schema (one row per input document):
    doc_id: string
    spans:  passthrough, byte-identical (the per-row span-sequence invariant)
    ner:    list<struct<span_idx:int32, tokens:list<string>,
                        tags:list<string>, bio_tags:list<string>,
                        phi_tags:list<string>>>
    triples: list<struct<span_idx, subj, subj_type, pred, obj, obj_type>>
    mentions: list<struct<span_idx, surface, etype>>
    harvest: list<struct<term:string, label:string>>
"""

from __future__ import annotations

import pyarrow as pa

from ..assets import SERVERS_CONFIG, build_entity_map
from ..backends import default_backends
from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions import masking
from ..functions.kg import extract_entity_spans, extract_triples
from ..functions.tagger import ensemble_tag_sentence

NER_STRUCT = pa.struct(
    [
        ("span_idx", pa.int32()),
        ("tokens", pa.list_(pa.string())),
        ("tags", pa.list_(pa.string())),
        ("bio_tags", pa.list_(pa.string())),
        ("phi_tags", pa.list_(pa.string())),
    ]
)
TRIPLE_STRUCT = pa.struct(
    [
        ("span_idx", pa.int32()),
        ("subj", pa.string()),
        ("subj_type", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_type", pa.string()),
    ]
)
MENTION_STRUCT = pa.struct(
    [
        ("span_idx", pa.int32()),
        ("surface", pa.string()),
        ("etype", pa.string()),
    ]
)
HARVEST_STRUCT = pa.struct([("term", pa.string()), ("label", pa.string())])
QUARANTINE_STRUCT = pa.struct(
    [("span_idx", pa.int32()), ("error", pa.string())]
)


class NerTagger:
    """Actor-pool stage: interleaved documents -> tagged documents."""

    def __init__(self, config: PipelineConfig = DEFAULT_CONFIG):
        from collections import OrderedDict

        self.config = config
        self.emap = build_entity_map()
        self.backends = default_backends(config.top_k_descs, config.scorer_backend)
        self.servers_config = SERVERS_CONFIG
        # POS model state is per-actor (trained/loaded ONCE here, like the
        # descriptor backends), selected by config
        if config.pos_backend == "perceptron":
            from ..functions.pos_perceptron import perceptron_pos_terms

            self.pos_backend = perceptron_pos_terms
        elif config.pos_backend == "heuristic":
            self.pos_backend = None  # detect_terms falls back to POS-lite
        else:
            raise ValueError(f"unknown pos_backend {config.pos_backend!r}")
        # tag_text is a pure function of the sentence text (backends/config
        # are fixed per actor), so identical sentences — boilerplate repeats
        # dominate web corpora — hit this per-actor LRU instead of re-running
        # mask/score/ensemble.  Consumers only READ the cached dict.
        self._cache: "OrderedDict[str, dict]" = OrderedDict()
        self._cache_max = config.sentence_cache_size

    def tag_text(self, text: str) -> dict:
        if self._cache_max:
            hit = self._cache.get(text)
            if hit is not None:
                self._cache.move_to_end(text)
                return hit
        res = ensemble_tag_sentence(
            text, self.backends, self.emap,
            self.config.suppress_untagged, self.config.common_descs,
            self.servers_config, self.config.aggregation_variant,
            pos_backend=self.pos_backend,
        )
        if self._cache_max:
            self._cache[text] = res
            if len(self._cache) > self._cache_max:
                self._cache.popitem(last=False)
        return res

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans").to_pylist()
        ner_rows, triple_rows, mention_rows = [], [], []
        harvest_rows, quarantine_rows = [], []
        for spans in spans_col:
            ner_r, triple_r, mention_r, harvest_r, quar_r = [], [], [], [], []
            for span_idx, span in enumerate(spans or []):
                if span["kind"] != "text":
                    continue
                # blank lines are skipped at the source in the reference
                # (run_test, batched_main_NER.py:806: `if len(line) > 1`)
                if not span["text"] or not span["text"].strip():
                    continue
                try:
                    res = self.tag_text(span["text"])
                except Exception as exc:  # noqa: BLE001
                    # row-level poison-pill capture: a pathological sentence
                    # goes to the quarantine side-channel instead of failing
                    # the whole block/job (the reference's analog is the
                    # empty-result-after-10-retries path,
                    # batched_main_NER.py:266-268)
                    quar_r.append(
                        {
                            "span_idx": span_idx,
                            "error": f"{type(exc).__name__}: {exc}"[:500],
                        }
                    )
                    continue
                tags = res["ensembled_tags"]
                tokens = res["tokens"]
                ner_r.append(
                    {
                        "span_idx": span_idx,
                        "tokens": tokens,
                        "tags": tags,
                        "bio_tags": [t for _, t in res["per_model"][0]["tags"]],
                        "phi_tags": [t for _, t in res["per_model"][1]["tags"]],
                    }
                )
                for t in extract_triples(tokens, tags, self.config.max_predicate_tokens):
                    triple_r.append({"span_idx": span_idx, **t})
                for m in extract_entity_spans(tokens, tags):
                    mention_r.append(
                        {
                            "span_idx": span_idx,
                            "surface": m["surface"],
                            "etype": m["etype"],
                        }
                    )
                for term, label in res["harvest"]:
                    harvest_r.append({"term": term, "label": label})
            ner_rows.append(ner_r)
            triple_rows.append(triple_r)
            mention_rows.append(mention_r)
            harvest_rows.append(harvest_r)
            quarantine_rows.append(quar_r)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "spans": batch.column("spans"),  # passthrough: invariant
                "ner": pa.array(ner_rows, pa.list_(NER_STRUCT)),
                "triples": pa.array(triple_rows, pa.list_(TRIPLE_STRUCT)),
                "mentions": pa.array(mention_rows, pa.list_(MENTION_STRUCT)),
                "harvest": pa.array(harvest_rows, pa.list_(HARVEST_STRUCT)),
                "quarantine": pa.array(quarantine_rows, pa.list_(QUARANTINE_STRUCT)),
            }
        )


def tag_documents(docs, config: PipelineConfig = DEFAULT_CONFIG, concurrency: int | None = None):
    """documents Dataset -> tagged Dataset (streaming, actor pool)."""
    # autoscaling pool (1, N): never reserves every CPU, so downstream
    # groupby/write tasks aren't starved (a fixed pool == num_cpus would
    # serialize the pipeline)
    return docs.map_batches(
        NerTagger,
        fn_constructor_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=config.tagger_batch_size,
        concurrency=(1, concurrency or config.tagger_concurrency),
        num_cpus=1,
    )


class SingleModelTagger:
    """One-model tagging stage for the JOIN-BASED ensemble variant.

    The default engine path scores BOTH backends inside one actor pass
    (NerTagger) — cheaper than two passes + a join on a huge table (SURVEY.md
    §7.4).  This variant exists for heterogeneous hardware (e.g. the bio
    model on GPU actors, the base model on CPU actors): each model runs as
    its own actor pool and the per-document results meet again in a
    hash-partitioned join keyed on doc_id.

    Output: doc_id, spans, <name>_results: list<struct<span_idx,
    result_json>> — the per-sentence D13 dict serialized as JSON (ragged
    position-keyed maps; consumed row-locally by the resolve stage).
    """

    def __init__(self, model_name: str, config: PipelineConfig = DEFAULT_CONFIG):
        from ..backends import default_backends

        self.config = config
        self.emap = build_entity_map()
        self.backend = [
            b
            for b in default_backends(config.top_k_descs, config.scorer_backend)
            if b.name == model_name
        ][0]
        self.model_name = model_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        from ..functions.tagger import tag_sentence

        results_col = []
        spans_json = []
        for spans in batch.column("spans").to_pylist():
            row = {}
            quar = []
            for span_idx, span in enumerate(spans or []):
                if span["kind"] != "text" or not span["text"] or not span["text"].strip():
                    continue
                try:
                    res = tag_sentence(
                        span["text"], self.backend, self.emap,
                        self.config.suppress_untagged, self.config.common_descs,
                        self.config.aggregation_variant,
                    )
                except Exception as exc:  # noqa: BLE001
                    # same row-level poison-pill contract as NerTagger: the
                    # bad sentence rides the quarantine side-channel through
                    # the join instead of failing the whole job
                    quar.append(
                        {
                            "span_idx": span_idx,
                            "error": f"{self.model_name}: {type(exc).__name__}: {exc}"[:500],
                        }
                    )
                    continue
                row[span_idx] = res["result"]
            results_col.append(json.dumps({"r": row, "q": quar}))
            if self.model_name == "bio":
                spans_json.append(json.dumps(spans or []))
        # nested payloads cross the join as JSON strings: Acero hash joins
        # reject list<struct> non-key fields, and the payload is consumed
        # row-locally right after the join anyway
        cols = {
            "doc_id": batch.column("doc_id"),
            f"{self.model_name}_results": pa.array(results_col, pa.large_string()),
        }
        if self.model_name == "bio":
            cols["spans_json"] = pa.array(spans_json, pa.large_string())
        return pa.table(cols)


def tag_documents_split(
    docs, config: PipelineConfig = DEFAULT_CONFIG, num_partitions: int = 8
):
    """Join-based dual-model tagging: two single-model actor pools over the
    same input, hash-joined on doc_id, then row-local ensemble resolution.
    Produces the same schema as ``tag_documents`` (minus per-model tag
    columns' provenance being recomputed from the joined results)."""
    import json

    from ..assets import SERVERS_CONFIG
    from ..functions.ensemble import ensemble_processing

    bio = docs.map_batches(
        SingleModelTagger,
        fn_constructor_kwargs={"model_name": "bio", "config": config},
        batch_format="pyarrow",
        batch_size=config.tagger_batch_size,
        concurrency=(1, max(1, config.tagger_concurrency // 2)),
    )
    phi = docs.map_batches(
        SingleModelTagger,
        fn_constructor_kwargs={"model_name": "phi", "config": config},
        batch_format="pyarrow",
        batch_size=config.tagger_batch_size,
        concurrency=(1, max(1, config.tagger_concurrency // 2)),
    )
    joined = bio.join(
        phi,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def _resolve(batch: pa.Table) -> pa.Table:
        from ..functions.kg import extract_entity_spans, extract_triples

        ner_rows, triple_rows, mention_rows, harvest_rows = [], [], [], []
        quarantine_rows = []
        spans_col = []
        for spans_j, bio_j, phi_j in zip(
            batch.column("spans_json").to_pylist(),
            batch.column("bio_results").to_pylist(),
            batch.column("phi_results").to_pylist(),
        ):
            spans = json.loads(spans_j)
            spans_col.append(spans)
            bio_env = json.loads(bio_j)
            phi_env = json.loads(phi_j)
            bio_by_idx = {int(k): v for k, v in bio_env["r"].items()}
            phi_by_idx = {int(k): v for k, v in phi_env["r"].items()}
            quarantine_rows.append(bio_env["q"] + phi_env["q"])
            ner_r, triple_r, mention_r, harvest_r = [], [], [], []
            for span_idx in sorted(bio_by_idx):
                if span_idx not in phi_by_idx:
                    continue  # quarantined on the phi side
                rb, rp = bio_by_idx[span_idx], phi_by_idx[span_idx]
                ens = ensemble_processing([rb, rp], SERVERS_CONFIG)
                n = len(ens["ensembled_ner"])
                tags = [ens["ensembled_ner"][str(i + 1)]["e"] for i in range(n)]
                text = spans[span_idx]["text"]
                # same tokenization as NerTagger (masking.detect_terms):
                # marker stripped only from words that END with it — a global
                # replace would diverge on a mid-word ':__entity__'
                tokens = [w for w, _ in masking.detect_terms(text)]
                ner_r.append(
                    {
                        "span_idx": span_idx,
                        "tokens": tokens,
                        "tags": tags,
                        "bio_tags": [v["e"] for v in rb["ner"].values()],
                        "phi_tags": [v["e"] for v in rp["ner"].values()],
                    }
                )
                for t in extract_triples(tokens, tags, DEFAULT_CONFIG.max_predicate_tokens):
                    triple_r.append({"span_idx": span_idx, **t})
                for m in extract_entity_spans(tokens, tags):
                    mention_r.append(
                        {"span_idx": span_idx, "surface": m["surface"], "etype": m["etype"]}
                    )
                for term, label in rb.get("harvest", []):
                    harvest_r.append({"term": term, "label": label})
            ner_rows.append(ner_r)
            triple_rows.append(triple_r)
            mention_rows.append(mention_r)
            harvest_rows.append(harvest_r)
        span_type = pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.large_string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            )
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "spans": pa.array(spans_col, span_type),
                "ner": pa.array(ner_rows, pa.list_(NER_STRUCT)),
                "triples": pa.array(triple_rows, pa.list_(TRIPLE_STRUCT)),
                "mentions": pa.array(mention_rows, pa.list_(MENTION_STRUCT)),
                "harvest": pa.array(harvest_rows, pa.list_(HARVEST_STRUCT)),
                "quarantine": pa.array(quarantine_rows, pa.list_(QUARANTINE_STRUCT)),
            }
        )

    return joined.map_batches(_resolve, batch_format="pyarrow")


def explode_triples(tagged):
    """Tagged docs -> flat triples table with canonical entity ids.

    Stateless map_batches (1->N rows); ids are content-addressed
    (functions/kg.entity_id) so no shuffle or id service is needed.
    """
    from ..functions.kg import entity_id, normalize_surface

    def _explode(batch: pa.Table) -> pa.Table:
        out = {
            "doc_id": [], "span_idx": [], "subj": [], "subj_type": [],
            "pred": [], "obj": [], "obj_type": [],
            "subj_norm": [], "obj_norm": [], "subj_id": [], "obj_id": [],
        }
        for doc_id, triples in zip(
            batch.column("doc_id").to_pylist(), batch.column("triples").to_pylist()
        ):
            for t in triples or []:
                sn, on = normalize_surface(t["subj"]), normalize_surface(t["obj"])
                out["doc_id"].append(doc_id)
                out["span_idx"].append(t["span_idx"])
                out["subj"].append(t["subj"])
                out["subj_type"].append(t["subj_type"])
                out["pred"].append(t["pred"])
                out["obj"].append(t["obj"])
                out["obj_type"].append(t["obj_type"])
                out["subj_norm"].append(sn)
                out["obj_norm"].append(on)
                out["subj_id"].append(entity_id(sn))
                out["obj_id"].append(entity_id(on))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "span_idx": pa.array(out["span_idx"], pa.int32()),
                "subj": pa.array(out["subj"], pa.string()),
                "subj_type": pa.array(out["subj_type"], pa.string()),
                "pred": pa.array(out["pred"], pa.string()),
                "obj": pa.array(out["obj"], pa.string()),
                "obj_type": pa.array(out["obj_type"], pa.string()),
                "subj_norm": pa.array(out["subj_norm"], pa.string()),
                "obj_norm": pa.array(out["obj_norm"], pa.string()),
                "subj_id": pa.array(out["subj_id"], pa.string()),
                "obj_id": pa.array(out["obj_id"], pa.string()),
            }
        )

    return tagged.map_batches(_explode, batch_format="pyarrow")


def explode_mentions(tagged):
    """Tagged docs -> flat mentions table (doc_id, span_idx, surface, etype,
    surface_norm, mention entity id)."""
    from ..functions.kg import entity_id, normalize_surface

    def _explode(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "span_idx": [], "surface": [], "etype": [],
               "surface_norm": [], "eid": []}
        for doc_id, mentions in zip(
            batch.column("doc_id").to_pylist(), batch.column("mentions").to_pylist()
        ):
            for m in mentions or []:
                n = normalize_surface(m["surface"])
                out["doc_id"].append(doc_id)
                out["span_idx"].append(m["span_idx"])
                out["surface"].append(m["surface"])
                out["etype"].append(m["etype"])
                out["surface_norm"].append(n)
                out["eid"].append(entity_id(n))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "span_idx": pa.array(out["span_idx"], pa.int32()),
                "surface": pa.array(out["surface"], pa.string()),
                "etype": pa.array(out["etype"], pa.string()),
                "surface_norm": pa.array(out["surface_norm"], pa.string()),
                "eid": pa.array(out["eid"], pa.string()),
            }
        )

    return tagged.map_batches(_explode, batch_format="pyarrow")


def ner_eval(mentions, labels=None):
    """Distributed NER accuracy evaluation — the engine operator form of the
    reference's external benchmark-scoring loop (``ner_test``, README.md:19,64
    over ner_labeling/*.txt extracts): predicted mentions joined against a
    gold surface->type table, reduced to per-type TP/FP/FN and integer-ppm
    precision/recall/F1.

    Shape (scale-safe): the label table is vocab-bounded, so it broadcasts
    ONCE via ``ray.put`` and each mention batch tags itself (pred, gold) for
    LABELED surfaces only (inner-join semantics) and pre-aggregates to
    (etype, tp, n_pred, n_gold, n_unlab) partials — the shuffle carries one
    row per (batch, type), never the mention stream.  One small groupby Sum
    merges partials; the finalize pass derives fp = n_pred - tp,
    fn = n_gold - tp and the ppm metrics with FLOOR division so the DuckDB
    oracle matches bit-for-bit (precision/recall are 0 when their
    denominator is 0; a type appears if it was ever predicted — labeled or
    not — or ever gold).

    The P/R/F1 metrics are LABELED-surface metrics: predictions whose
    surface has no gold label are excluded from tp/fp (they are neither
    right nor wrong against this gold set), so ``precision_ppm`` can
    overstate corpus precision.  The ``unlabeled_pred`` column counts the
    excluded predictions per type so consumers see exactly how much of the
    prediction stream the metric does not judge.

    Returns a Dataset (etype, tp, fp, fn, unlabeled_pred, precision_ppm,
    recall_ppm, f1_ppm) sorted by etype.
    """
    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ..assets import build_gold_labels

    if labels is None:
        labels = build_gold_labels()
    lab_ref = ray.put(dict(zip(labels["surface_norm"], labels["gold_type"])))

    _EMPTY = pa.table(
        {
            "etype": pa.array([], pa.string()),
            "tp": pa.array([], pa.int64()),
            "n_pred": pa.array([], pa.int64()),
            "n_gold": pa.array([], pa.int64()),
            "n_unlab": pa.array([], pa.int64()),
        }
    )

    def _partial(t: pa.Table) -> pa.Table:
        lb = ray.get(lab_ref)
        sn = t.column("surface_norm").to_pandas()
        gold = sn.map(lb)
        if len(sn) == 0:
            return _EMPTY
        mask = gold.notna().to_numpy()
        pred_all = t.column("etype").to_pandas().to_numpy()
        df = pd.DataFrame(
            {"pred": pred_all[mask], "gold": gold.to_numpy()[mask]}
        )
        df["hit"] = (df["pred"] == df["gold"]).astype(np.int64)
        p = df.groupby("pred").agg(tp=("hit", "sum"), n_pred=("hit", "size"))
        g = df.groupby("gold").size().rename("n_gold")
        u = pd.Series(pred_all[~mask]).value_counts().rename("n_unlab")
        m = (
            p.join(g, how="outer")
            .join(u, how="outer")
            .fillna(0)
            .reset_index(names="etype")
        )
        return pa.table(
            {
                "etype": pa.array(m["etype"], pa.string()),
                "tp": pa.array(m["tp"].to_numpy(np.int64)),
                "n_pred": pa.array(m["n_pred"].to_numpy(np.int64)),
                "n_gold": pa.array(m["n_gold"].to_numpy(np.int64)),
                "n_unlab": pa.array(m["n_unlab"].to_numpy(np.int64)),
            }
        )

    def _finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            # Ray's hash-shuffle groupby emits zero-column blocks for empty
            # partitions; normalize to the output schema
            return pa.table(
                {
                    "etype": pa.array([], pa.string()),
                    "tp": pa.array([], pa.int64()),
                    "fp": pa.array([], pa.int64()),
                    "fn": pa.array([], pa.int64()),
                    "unlabeled_pred": pa.array([], pa.int64()),
                    "precision_ppm": pa.array([], pa.int64()),
                    "recall_ppm": pa.array([], pa.int64()),
                    "f1_ppm": pa.array([], pa.int64()),
                }
            )
        tp = t.column("tp").to_numpy()
        npred = t.column("n_pred").to_numpy()
        ngold = t.column("n_gold").to_numpy()
        nunlab = t.column("n_unlab").to_numpy()
        p_ppm = np.where(npred > 0, tp * 1_000_000 // np.maximum(npred, 1), 0)
        r_ppm = np.where(ngold > 0, tp * 1_000_000 // np.maximum(ngold, 1), 0)
        f1_ppm = 2 * tp * 1_000_000 // np.maximum(npred + ngold, 1)
        return pa.table(
            {
                "etype": t.column("etype"),
                "tp": pa.array(tp, pa.int64()),
                "fp": pa.array(npred - tp, pa.int64()),
                "fn": pa.array(ngold - tp, pa.int64()),
                "unlabeled_pred": pa.array(nunlab, pa.int64()),
                "precision_ppm": pa.array(p_ppm, pa.int64()),
                "recall_ppm": pa.array(r_ppm, pa.int64()),
                "f1_ppm": pa.array(f1_ppm, pa.int64()),
            }
        )

    return (
        mentions.map_batches(_partial, batch_format="pyarrow")
        .groupby("etype")
        .aggregate(
            Sum("tp", alias_name="tp"),
            Sum("n_pred", alias_name="n_pred"),
            Sum("n_gold", alias_name="n_gold"),
            Sum("n_unlab", alias_name="n_unlab"),
        )
        .map_batches(_finalize, batch_format="pyarrow")
        .sort("etype")
    )
