"""Same-session A/B timing for bench-drift attribution (VERDICT r4 item 4).

Runs the queries under suspicion (q_bpe_train 8.1->25.8 s r3->r4,
q_skew_join 6.3->10.6 s) best-of-3 in ONE fresh Ray session alongside an
unchanged-code control (q_token_histogram), so host-load noise is visible
in the control instead of confounding the verdict.  For q_skew_join the
changed kernel (duplicate-build-key span expansion, joins.py) is also
timed standalone.

Usage: python tools/ab_bench.py [sf_dir] [num_cpus]
Prints one JSON line; record the conclusion in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("RAY_GRAFT_CPUS", "32")
    )
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from unsupervised_ner_ray.sources.io import read_sf
    from unsupervised_ner_ray.stages import joins as _joins
    from unsupervised_ner_ray.stages import textstats

    docs_tbl = read_sf(sf_dir, "documents", columns=["doc_id", "text"])

    def best_of(name: str, fn, n: int = 3) -> list[float]:
        runs = []
        for _ in range(n):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        print(f"{name}: runs={runs} best={min(runs)}", file=sys.stderr)
        return runs

    out = {"sf_dir": sf_dir, "num_cpus": num_cpus, "runs": {}}
    # warmup: spin the worker pool up once so run 1 isn't cold-start noise
    docs_tbl.count()
    out["runs"]["control_token_histogram"] = best_of(
        "control_token_histogram",
        lambda: textstats.token_histogram(docs_tbl).to_pandas(),
    )
    out["runs"]["q_bpe_train"] = best_of(
        "q_bpe_train", lambda: textstats.bpe_train(docs_tbl, num_merges=10)
    )
    out["runs"]["q_skew_join"] = best_of(
        "q_skew_join", lambda: _joins.q_skew_join_events(sf_dir).to_pandas()
    )
    out["best"] = {k: min(v) for k, v in out["runs"].items()}
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
