"""Property-based fuzz of the per-row span-sequence invariant: for ANY
interleaved spans column (media-only docs, empty text, unicode, huge offsets,
empty span lists), NerTagger emits the spans column byte-identical and never
raises — failures land in the quarantine side-channel instead."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from unsupervised_ner_ray.stages.ner import NerTagger

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)
_span = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["text", "image", "audio", "video"]),
        "text": _text,
        "media_ref": st.one_of(st.none(), st.text(max_size=20)),
        "offset": st.integers(min_value=0, max_value=2**31 - 1),
    }
)
_doc = st.lists(_span, max_size=6)


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=4))
def test_spans_pass_through_unchanged(docs):
    tagger = _TAGGER
    batch = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(docs))], pa.string()),
            "spans": pa.array(
                docs,
                pa.list_(
                    pa.struct(
                        [
                            ("kind", pa.string()),
                            ("text", pa.string()),
                            ("media_ref", pa.string()),
                            ("offset", pa.int32()),
                        ]
                    )
                ),
            ),
        }
    )
    out = tagger(batch)
    got = out.column("spans").to_pylist()
    want = batch.column("spans").to_pylist()
    assert got == want  # kind, text, media_ref, offset AND order


_TAGGER = NerTagger()
