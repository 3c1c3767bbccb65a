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


# ---- media codec fuzz: hand-written codecs round-trip for ANY small image


_dims = st.tuples(
    st.integers(min_value=1, max_value=40), st.integers(min_value=1, max_value=40)
)


@settings(max_examples=40, deadline=None)
@given(_dims, st.integers(min_value=0, max_value=2**32 - 1))
def test_codec_roundtrips_any_image(dims, seed):
    import numpy as np

    from unsupervised_ner_ray.functions import media_codecs as mc

    h, w = dims
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)
    assert np.array_equal(mc.decode_png(mc.encode_png(img)), img)
    jp = mc.decode_jpeg(mc.encode_jpeg(img, quant=1))
    assert jp.shape == img.shape
    assert np.abs(jp.astype(int) - img.astype(int)).max() <= 6
    # AVI of two frames round-trips per frame within JPEG tolerance
    dec, fps = mc.decode_avi_mjpeg(mc.encode_avi_mjpeg([img, img], fps=3, quant=1))
    assert fps == 3 and len(dec) == 2
    assert np.abs(dec[0].astype(int) - img.astype(int)).max() <= 6


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="ab ", max_size=30), min_size=1, max_size=6))
def test_minhash_signature_whitespace_invariant(texts):
    """Signatures depend only on the nonempty-token stream: collapsing runs
    of spaces never changes a signature (empty tokens are dropped)."""
    import re

    from unsupervised_ner_ray.stages.dedup import MinHasher

    mh = MinHasher(num_hashes=8)
    for t in texts:
        collapsed = re.sub(" +", " ", t).strip()
        assert mh.signature(t).tolist() == mh.signature(collapsed).tolist()
