"""Regression pin: the full tag+ensemble+triple output for 20 reference
sentences is frozen in tests/fixtures/goldens_v1.json.  Any semantic drift
in masking/aggregation/pooling/ensemble/triple-extraction (or in the mock
backend's determinism) fails here with an exact diff.

Regenerate ONLY on an intentional semantics change:
    python - <<'EOF'   # see test file header in git history
"""

import json
import os

from unsupervised_ner_ray.assets import build_entity_map
from unsupervised_ner_ray.backends import default_backends
from unsupervised_ner_ray.functions.kg import extract_triples
from unsupervised_ner_ray.functions.tagger import ensemble_tag_sentence

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "goldens_v1.json")


def test_golden_pin():
    with open(FIXTURE) as fp:
        goldens = json.load(fp)
    assert len(goldens) == 20
    emap = build_entity_map()
    backends = default_backends()
    for g in goldens:
        r = ensemble_tag_sentence(g["sentence"], backends, emap)
        assert r["tokens"] == g["tokens"], g["sentence"]
        assert r["ensembled_tags"] == g["tags"], g["sentence"]
        triples = extract_triples(r["tokens"], r["ensembled_tags"])
        assert triples == g["triples"], g["sentence"]
