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
        self.config = config
        self.emap = build_entity_map()
        self.backends = default_backends(config.top_k_descs)
        self.servers_config = SERVERS_CONFIG

    def tag_text(self, text: str) -> dict:
        return ensemble_tag_sentence(
            text, self.backends, self.emap,
            self.config.suppress_untagged, self.config.common_descs,
            self.servers_config, self.config.aggregation_variant,
        )

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
