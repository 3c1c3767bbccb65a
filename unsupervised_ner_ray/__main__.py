"""CLI entry point: ``python -m unsupervised_ner_ray <cmd>``.

Designed for ``ray job submit -- python -m unsupervised_ner_ray run ...``;
this module owns the Ray session (the library never calls ray.init).

Commands:
  run        --input <parquet file|dir> --out <dir> [--shards N]
             checkpointed flagship NER->KG run (resumable: rerun the same
             command after a kill and completed shards are skipped)
  gen        --out <path> --docs N [--seed S] [--files K]
             write a deterministic interleaved corpus
  tag-file   --input <text file> --out <conll file>
             reference-CLI parity: one sentence per line -> CoNLL tags
             (the engine analog of `batched_main_NER.py -option specific`)
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="unsupervised_ner_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run")
    runp.add_argument("--input", required=True)
    runp.add_argument("--out", required=True)
    runp.add_argument("--shards", type=int, default=16)
    runp.add_argument("--num-cpus", type=int, default=None)
    genp = sub.add_parser("gen")
    genp.add_argument("--out", required=True)
    genp.add_argument("--docs", type=int, required=True)
    genp.add_argument("--seed", type=int, default=42)
    genp.add_argument("--files", type=int, default=1)
    tagp = sub.add_parser("tag-file")
    tagp.add_argument("--input", required=True)
    tagp.add_argument("--out", required=True)
    servep = sub.add_parser("serve")
    servep.add_argument("--port", type=int, default=8086)
    servep.add_argument("--scorer-backend", default=None)
    args = p.parse_args(argv)

    if args.cmd == "gen":
        from .corpus import write_corpus

        path = write_corpus(args.out, args.docs, args.seed, n_files=args.files)
        print(json.dumps({"written": path, "docs": args.docs}))
        return 0

    if args.cmd == "run":
        _init_ray(args.num_cpus)
        from .pipelines.flagship import run_flagship_checkpointed

        r = run_flagship_checkpointed(args.input, args.out, num_shards=args.shards)
        print(json.dumps(r))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "serve":
        # reference entry point parity: batched_p3_server.py (default port
        # 8086).  In-process tagging state, no Ray session needed.
        from .config import PipelineConfig
        from .serving import serve_forever

        cfg = (
            PipelineConfig(scorer_backend=args.scorer_backend)
            if args.scorer_backend
            else None
        )
        print(json.dumps({"serving": True, "port": args.port}), flush=True)
        serve_forever(args.port, cfg)
        return 0

    if args.cmd == "tag-file":
        # sequential reference-parity path (one sentence per line); no Ray
        # needed — this mirrors run_test (batched_main_NER.py:800-811)
        from .assets import build_entity_map
        from .backends import default_backends
        from .functions.emission import to_conll
        from .functions.tagger import ensemble_tag_sentence

        emap = build_entity_map()
        backends = default_backends()
        n = 0
        with open(args.input) as inp, open(args.out, "w") as out:
            for line in inp:
                if len(line) > 1:
                    res = ensemble_tag_sentence(line.rstrip("\n"), backends, emap)
                    out.write(
                        to_conll(list(zip(res["tokens"], res["ensembled_tags"])))
                    )
                    n += 1
        print(json.dumps({"sentences": n, "out": args.out}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
