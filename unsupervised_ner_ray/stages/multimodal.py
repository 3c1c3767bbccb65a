"""Multimodal column stages (image/audio/video as opaque binary + metadata).

Decode kernels are REAL for every format ``functions/media_codecs`` handles
(P6 PPM / 24-bit BMP / PNG / GIF / baseline JPEG / PCM WAV / AVI-MJPEG —
own zlib/LZW/DCT+Huffman byte decoders, no PIL/ffmpeg): ``backend="real"``
on the featurize/resize stages decodes the ``payload`` column and computes
features / letterbox resamples from the decoded pixels or samples.  Only
codecs outside that set (WebP/MP3/H.264...) stay behind the gated
PIL/ffmpeg seam in media_codecs.  ``backend="fake"`` remains for corpora
that carry refs but no bytes: deterministic ref-hash features/dims with the
same schema (the Ray-side plumbing — actor pool, batch sizing, output
layout — is identical either way).

Media spans ride the interleaved documents table (BASELINE.json input_hint);
``extract_media_refs`` explodes them to a media table without touching the
text pipeline; ``synthesize_payloads`` attaches real encoded bytes where the
corpus has none (a production run swaps it for a blob-store fetch).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def extract_media_refs(docs):
    """Interleaved docs -> media table (doc_id, span_idx, kind, media_ref).

    Vectorized list-flatten (the ``explode_tokens`` pattern): the spans
    list column flattens to one struct row per span with
    ``list_parent_indices`` recovering the owning doc row and a cumsum of
    list lengths recovering the within-doc span index — no Python loop
    over rows."""

    def _f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        lengths = (
            pc.fill_null(pc.list_value_length(spans), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        starts = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=starts[1:])
        span_idx = np.arange(len(flat), dtype=np.int64) - starts[parent]
        out = pa.table(
            {
                "doc_id": pc.take(
                    batch.column("doc_id").cast(pa.string()), pa.array(parent)
                ),
                "span_idx": pa.array(span_idx.astype(np.int32), pa.int32()),
                "kind": flat.field("kind").cast(pa.string()),
                "media_ref": flat.field("media_ref").cast(pa.string()),
            }
        )
        return out.filter(pc.not_equal(out.column("kind"), "text"))

    return docs.map_batches(_f, batch_format="pyarrow")


class MediaFeaturizer:
    """Actor-pool stage: media row -> fixed-dim feature vector.

    ``backend="real"`` (default when the input carries a ``payload``
    column) DECODES the payload bytes — decode_image / decode_wav /
    decode_avi_mjpeg from ``functions/media_codecs``, all real byte
    decoders — and computes features from the decoded pixels/samples
    (mean-RGB + luminance histogram for images and frames, duration / RMS /
    ZCR + segment RMS for audio; video features are the per-frame mean).
    Decoder tables load once per actor in ``__init__``; undecodable
    payloads degrade to a zero vector with ``feat_ok=false`` (quarantine
    shape, never a poisoned batch).  ``backend="fake"`` derives a
    deterministic vector from the ref hash — for corpora with refs but no
    bytes.
    """

    def __init__(self, dim: int = 8, backend: str = "real", target: int = 224):
        from ..functions import media_codecs as mc

        self.mc = mc
        self.dim = dim
        self.target = target
        if backend not in ("real", "fake"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend

    def _fake_features(self, ref: str) -> np.ndarray:
        h = hashlib.blake2b(ref.encode(), digest_size=self.dim * 4).digest()
        arr = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
        return arr / np.float64(2**32)

    def _real_features(self, buf: bytes, kind: str) -> np.ndarray:
        mc = self.mc
        if kind == "audio":
            samples, rate = mc.decode_wav(buf)
            return mc.audio_features(samples, rate, self.dim)
        if kind == "video":
            frames, _fps = mc.decode_avi_mjpeg(buf)
            fmat = np.stack(
                [
                    mc.image_features(mc.letterbox_resize(f, self.target)[0], self.dim)
                    for f in frames
                ]
            )
            return fmat.mean(axis=0)
        img = mc.decode_image(buf)
        return mc.image_features(mc.letterbox_resize(img, self.target)[0], self.dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "fake":
            feats = [
                self._fake_features(r).tolist()
                for r in batch.column("media_ref").to_pylist()
            ]
            ok = [True] * len(batch)
        else:
            if "payload" not in batch.column_names:
                raise ValueError(
                    "backend='real' needs a payload column "
                    "(synthesize_payloads or a blob-store fetch upstream)"
                )
            feats, ok = [], []
            for buf, kind in zip(
                batch.column("payload").to_pylist(), batch.column("kind").to_pylist()
            ):
                try:
                    feats.append(self._real_features(buf, kind).tolist())
                    ok.append(True)
                except Exception:
                    # codecs can raise struct.error / zlib.error / IndexError
                    # on truncated buffers, not just ValueError — any
                    # undecodable payload degrades to the quarantine row
                    # rather than poisoning the batch
                    feats.append([0.0] * self.dim)
                    ok.append(False)
            batch = batch.drop_columns(["payload"])
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float64()))
        ).append_column("feat_ok", pa.array(ok, pa.bool_()))


def featurize_media(
    media,
    dim: int = 8,
    concurrency: int = 8,
    batch_size: int = 64,
    backend: str = "real",
):
    """Small batch_size on purpose: with real payloads each row is large
    binary; batch x concurrency must fit worker heaps."""
    return media.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"dim": dim, "backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class MediaResizer:
    """Image-resize actor stage.  ``backend="real"`` DECODES the image
    payload (media_codecs byte decoders), letterbox-resamples the actual
    pixels (area-mean downscale / nearest upscale) and re-encodes the
    resized raster as P6 PPM bytes in ``resized`` — a genuine
    decode->resample->encode hop per row.  Non-image kinds (audio/video)
    and undecodable payloads pass through with zeroed dims and an empty
    buffer (``resize_ok=false``).  ``backend="fake"`` derives source dims
    deterministically from the ref hash and computes only the letterbox
    GEOMETRY (for corpora with refs but no bytes).  Output schema is
    identical either way: (.., src_w, src_h, dst_w, dst_h, scale,
    resized: binary, resize_ok)."""

    def __init__(self, target: int = 224, backend: str = "real"):
        from ..functions import media_codecs as mc

        self.mc = mc
        self.target = target
        if backend not in ("real", "fake"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend

    def _fake_row(self, ref: str):
        h = hashlib.blake2b(ref.encode(), digest_size=4).digest()
        w0 = 64 + h[0] * 8  # deterministic fake source dims
        h0 = 64 + h[1] * 8
        s = self.target / max(w0, h0)
        w1, h1 = max(1, round(w0 * s)), max(1, round(h0 * s))
        return w0, h0, w1, h1, s, h * (w1 * h1 * 3 // 4 + 1), True

    def _real_row(self, buf: bytes, kind: str):
        if kind not in ("image",):
            return 0, 0, 0, 0, 0.0, b"", False
        mc = self.mc
        try:
            img = mc.decode_image(buf)
        except Exception:
            # same quarantine contract as MediaFeaturizer: struct/zlib/index
            # errors from corrupt buffers degrade per-row, never per-batch
            return 0, 0, 0, 0, 0.0, b"", False
        resized, s = mc.letterbox_resize(img, self.target)
        return (
            img.shape[1],
            img.shape[0],
            resized.shape[1],
            resized.shape[0],
            float(s),
            mc.encode_ppm(resized),
            True,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        src_w, src_h, dst_w, dst_h, scale, payload, ok = [], [], [], [], [], [], []
        if self.backend == "fake":
            rows = [self._fake_row(r) for r in batch.column("media_ref").to_pylist()]
        else:
            if "payload" not in batch.column_names:
                raise ValueError(
                    "backend='real' needs a payload column "
                    "(synthesize_payloads or a blob-store fetch upstream)"
                )
            rows = [
                self._real_row(buf, kind)
                for buf, kind in zip(
                    batch.column("payload").to_pylist(),
                    batch.column("kind").to_pylist(),
                )
            ]
            batch = batch.drop_columns(["payload"])
        for w0, h0, w1, h1, s, buf, good in rows:
            src_w.append(w0)
            src_h.append(h0)
            dst_w.append(w1)
            dst_h.append(h1)
            scale.append(s)
            payload.append(buf)
            ok.append(good)
        return (
            batch.append_column("src_w", pa.array(src_w, pa.int32()))
            .append_column("src_h", pa.array(src_h, pa.int32()))
            .append_column("dst_w", pa.array(dst_w, pa.int32()))
            .append_column("dst_h", pa.array(dst_h, pa.int32()))
            .append_column("scale", pa.array(scale, pa.float64()))
            .append_column("resized", pa.array(payload, pa.binary()))
            .append_column("resize_ok", pa.array(ok, pa.bool_()))
        )


def resize_media(
    media,
    target: int = 224,
    concurrency: int = 8,
    batch_size: int = 32,
    backend: str = "real",
):
    """batch_size smaller still than featurize: resized pixel buffers are the
    largest rows in the pipeline (batch x concurrency bounds heap)."""
    return media.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"target": target, "backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class FrameSampler:
    """Video frame sampling.  With a ``payload`` column (AVI/MJPEG bytes)
    this is REAL: a header-only container scan counts frames WITHOUT
    decoding any JPEG (``avi_frame_count``), then every ``stride``-th index
    is selected — the cheap-scan-then-selective-decode shape every
    at-scale frame sampler has (decode cost is per SELECTED frame only,
    via ``decode_avi_mjpeg(frame_indices=...)`` downstream).  Without a
    payload column it falls back to the deterministic ref-hash stub (for
    corpora that carry refs but no bytes; the ffmpeg path for non-MJPEG
    codecs stays behind the gated seam)."""

    def __init__(self, stride: int = 2, max_frames: int = 8):
        from ..functions import media_codecs as mc

        self.mc = mc
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        has_payload = "payload" in batch.column_names
        payloads = (
            batch.column("payload").to_pylist() if has_payload else [None] * len(batch)
        )
        out = []
        for ref, kind, buf in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("kind").to_pylist(),
            payloads,
        ):
            if buf is not None and kind == "video" and buf[:4] == b"RIFF":
                n, _fps = self.mc.avi_frame_count(buf)
                out.append(list(range(0, n, self.stride))[: self.max_frames])
            elif kind == "video" or not has_payload:
                n = 1 + int(hashlib.md5(ref.encode()).hexdigest()[:2], 16) % self.max_frames
                out.append(list(range(0, n * self.stride, self.stride)))
            else:
                out.append([])
        return batch.append_column(
            "frame_indices", pa.array(out, pa.list_(pa.int32()))
        )


def sample_frames(media, concurrency: int = 8):
    return media.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=64,
        concurrency=(1, concurrency),
    )


def synthesize_payloads(media, formats: tuple = ("ppm", "bmp", "png", "gif", "jpeg")):
    """media table -> + (payload: binary, fmt) with REAL encoded bytes,
    deterministically derived from each media_ref (the testdata carries no
    binaries; a production run replaces this stage with a blob-store fetch).
    Images are small pseudo-random RGB rasters, audio is a ref-seeded sine
    burst — every downstream decode/resize/featurize stage then operates on
    genuine format bytes, not geometry estimates."""
    from ..functions import media_codecs as mc

    def _f(batch: pa.Table) -> pa.Table:
        payloads, fmts = [], []
        for ref, kind in zip(
            batch.column("media_ref").to_pylist(), batch.column("kind").to_pylist()
        ):
            seed = int.from_bytes(hashlib.blake2b(ref.encode(), digest_size=4).digest(), "big")
            rng = np.random.RandomState(seed)
            if kind == "audio":
                t = np.arange(1600 + seed % 800)
                freq = 110.0 + (seed % 1000) / 4.0
                wave_s = (np.sin(2 * np.pi * freq * t / 16000.0) * 12000).astype(np.int16)
                payloads.append(mc.encode_wav(wave_s, rate=16000))
                fmts.append("wav")
            elif kind == "video":
                h = 16 + seed % 16
                w = 16 + (seed >> 8) % 16
                n_frames = 2 + seed % 5
                base = rng.randint(0, 200, (h, w, 3)).astype(np.int64)
                frames = [
                    np.clip(base + 10 * k, 0, 255).astype(np.uint8)
                    for k in range(n_frames)
                ]
                payloads.append(mc.encode_avi_mjpeg(frames, fps=5))
                fmts.append("avi")
            else:
                h = 16 + seed % 48
                w = 16 + (seed >> 8) % 48
                img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                fmt = formats[seed % len(formats)]
                enc = {
                    "ppm": mc.encode_ppm,
                    "bmp": mc.encode_bmp,
                    "png": mc.encode_png,
                    "gif": mc.encode_gif,
                    "jpeg": mc.encode_jpeg,
                }[fmt]
                payloads.append(enc(img))
                fmts.append(fmt)
        return batch.append_column("payload", pa.array(payloads, pa.binary())).append_column(
            "fmt", pa.array(fmts, pa.string())
        )

    return media.map_batches(_f, batch_format="pyarrow", batch_size=64)


class MediaDecoder:
    """Actor-pool stage: REAL decode of payload bytes — uncompressed
    (P6 PPM / 24-bit BMP via numpy, PCM WAV via stdlib wave) AND compressed
    (PNG via zlib, GIF via pure-python LZW); only JPEG/WebP/MP3 still raise
    through the gated PIL/ffmpeg seam (``functions/media_codecs``).
    Output: decode metadata + a ``dim``-d feature vector from
    the DECODED pixels/samples (mean-RGB + luminance histogram for images;
    duration/RMS/ZCR + segment RMS for audio)."""

    def __init__(self, dim: int = 8, target: int = 224):
        from ..functions import media_codecs as mc

        self.mc = mc
        self.dim = dim
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        mc = self.mc
        width, height, n_samples, rate, n_frames, feats, ok = [], [], [], [], [], [], []
        for buf, kind in zip(
            batch.column("payload").to_pylist(), batch.column("kind").to_pylist()
        ):
            # compute the full row BEFORE appending so a mid-decode error
            # can never leave the output columns misaligned; catch
            # Exception (struct/zlib/index errors from corrupt buffers,
            # not just ValueError) — quarantine per row, never per batch
            try:
                if kind == "audio":
                    samples, r = mc.decode_wav(buf)
                    row = (
                        0, 0, len(samples), r, 0,
                        mc.audio_features(samples, r, self.dim).tolist(),
                        True,
                    )
                elif kind == "video":
                    frames, _fps = mc.decode_avi_mjpeg(buf)
                    fmat = np.stack(
                        [
                            mc.image_features(
                                mc.letterbox_resize(f, self.target)[0], self.dim
                            )
                            for f in frames
                        ]
                    )
                    row = (
                        frames[0].shape[1], frames[0].shape[0], 0, 0,
                        len(frames), fmat.mean(axis=0).tolist(), True,
                    )
                else:
                    img = mc.decode_image(buf)
                    resized, _ = mc.letterbox_resize(img, self.target)
                    row = (
                        img.shape[1], img.shape[0], 0, 0, 0,
                        mc.image_features(resized, self.dim).tolist(), True,
                    )
            except Exception:
                row = (0, 0, 0, 0, 0, [0.0] * self.dim, False)
            width.append(row[0])
            height.append(row[1])
            n_samples.append(row[2])
            rate.append(row[3])
            n_frames.append(row[4])
            feats.append(row[5])
            ok.append(row[6])
        return (
            batch.drop_columns(["payload"])
            .append_column("width", pa.array(width, pa.int32()))
            .append_column("height", pa.array(height, pa.int32()))
            .append_column("n_samples", pa.array(n_samples, pa.int64()))
            .append_column("sample_rate", pa.array(rate, pa.int32()))
            .append_column("n_frames", pa.array(n_frames, pa.int32()))
            .append_column("decoded_ok", pa.array(ok, pa.bool_()))
            .append_column("features", pa.array(feats, pa.list_(pa.float64())))
        )


def decode_media(media_with_payloads, dim: int = 8, target: int = 224,
                 concurrency: int = 8, batch_size: int = 32):
    """Real-decode stage (small batch_size: rows carry binary payloads).
    The pure-python JPEG/AVI entropy decode is the hot kernel (~10 ms per
    item), so the actor pool — not the block count — must carry the
    parallelism: concurrency=2 left the stage ~2x parallel on a 32-cpu
    host (35 s remote time in 18.5 s wall at sf0.1); 8 actors track the
    measured per-task heap (~100 MiB) comfortably."""
    return media_with_payloads.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"dim": dim, "target": target},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Perceptual-hash (pHash) near-duplicate detection over image payloads.
#
# The image analog of the text dedup stack: decode -> 64-bit DCT perceptual
# hash (luminance -> 32x32 area-mean downsample -> 2-D DCT-II -> sign vs
# median of the 8x8 low-frequency block, the classic pHash recipe) ->
# SimHash-style 4x16-bit band blocking -> exact hamming verification inside
# each bucket.  Candidate generation is bucketed (never all-pairs); the
# decode+hash stage is an actor pool.  Exact-pixel duplicates hash equal
# regardless of container format (PPM vs BMP vs PNG vs GIF), so cross-format
# re-encodes of one raster are found at hamming 0; mild pixel noise on
# natural (smooth) images survives thanks to the low-pass DCT face.


def _dct_basis(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n x n): row k is the k-th cosine."""
    k = np.arange(n, dtype=np.float64)[:, None]
    x = np.arange(n, dtype=np.float64)[None, :]
    basis = np.sqrt(2.0 / n) * np.cos(np.pi * (2.0 * x + 1.0) * k / (2.0 * n))
    basis[0] *= 1.0 / np.sqrt(2.0)
    return basis


_DCT32 = _dct_basis(32)


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash of decoded RGB (or grayscale) pixels.

    Deterministic pure-numpy: luminance -> nearest-sample to 64x64 ->
    2x2 mean-pool to 32x32 (the pool gives mild noise averaging even for
    images below 64 px) -> 2-D DCT-II via the precomputed basis -> the
    8x8 lowest-frequency block thresholded at its median -> 64 bits packed
    MSB-first into a SIGNED int64 (arrow-friendly; same convention as the
    text SimHash column)."""
    if img.ndim == 3:
        lum = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    else:
        lum = img.astype(np.float64)
    h, w = lum.shape
    yi = np.minimum(np.arange(64) * h // 64, h - 1)
    xi = np.minimum(np.arange(64) * w // 64, w - 1)
    big = lum[yi][:, xi]
    small = big.reshape(32, 2, 32, 2).mean(axis=(1, 3))
    freq = _DCT32 @ small @ _DCT32.T
    block = freq[:8, :8].reshape(-1)
    bits = block > np.median(block)
    packed = np.packbits(bits.astype(np.uint8)).tobytes()
    return int.from_bytes(packed, "big", signed=True)


class PHasher:
    """Actor-pool stage: image payload bytes -> (phash: int64, phash_ok).

    Decode reuses the repo's own byte codecs (``functions/media_codecs``);
    undecodable payloads quarantine per ROW (phash_ok=false) exactly like
    MediaDecoder — a corrupt buffer never poisons the batch."""

    def __init__(self):
        from ..functions import media_codecs as mc

        self.mc = mc

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes, ok = [], []
        for buf in batch.column("payload").to_pylist():
            try:
                hashes.append(phash64(self.mc.decode_image(buf)))
                ok.append(True)
            except Exception:
                hashes.append(0)
                ok.append(False)
        return (
            batch.drop_columns(["payload"])
            .append_column("phash", pa.array(hashes, pa.int64()))
            .append_column("phash_ok", pa.array(ok, pa.bool_()))
        )


def phash_media(media_with_payloads, concurrency: int = 8, batch_size: int = 32):
    """Hash every IMAGE row of a media+payload table (other kinds are
    filtered before the pool — audio/video payloads never enter the image
    decode actors)."""
    imgs = media_with_payloads.filter(expr="kind == 'image'")
    return imgs.map_batches(
        PHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def phash_image_pairs(
    media_with_payloads,
    max_hamming: int = 6,
    concurrency: int = 8,
    num_parts: int = 64,
):
    """Near-duplicate image pairs (a, b, hamming), a < b by media_ref.

    Mirrors ``dedup.simhash_pairs``'s scale shape exactly: each 64-bit
    pHash explodes to 4 16-bit band keys; only rows sharing a (band_id,
    band_key) bucket ever meet (pigeonhole: hamming <= 3 GUARANTEES a
    shared band at 4 bands; radii 4-6 are best-effort recall — the same
    LSH trade the text SimHash twin documents); exact popcount verify
    inside each bucket; cross-band duplicate pairs collapse via the C-path
    Min aggregate.  Candidate work is bucket-local — no all-pairs matmul,
    no driver materialization."""
    import pandas as pd
    from ray.data.aggregate import Min

    from .grouping import hamming_pairs_frame, partitioned_map_groups

    sigs = phash_media(media_with_payloads, concurrency=concurrency)

    def _explode(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch.column("phash_ok"))
        n = len(batch)
        sims = batch.column("phash").to_numpy(zero_copy_only=False).astype(np.int64)
        u = sims.view(np.uint64) ^ np.uint64(1 << 63)
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
        keys = ((u[:, None] >> shifts) & np.uint64(0xFFFF)).reshape(-1)
        take_idx = pa.array(np.repeat(np.arange(n), 4), pa.int64())
        return pa.table(
            {
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_key": pa.array(keys.astype(np.int64), pa.int64()),
                "media_ref": batch.column("media_ref").take(take_idx),
                "phash": pa.array(np.repeat(sims, 4), pa.int64()),
            }
        )

    buckets = sigs.map_batches(_explode, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        return hamming_pairs_frame(g, "media_ref", "phash", max_hamming)

    pairs = partitioned_map_groups(buckets, ["band_id", "band_key"], _pairs, num_parts=num_parts)
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


def plant_near_dup_payloads(media_with_payloads, every: int = 4, noise: int = 0):
    """Append deterministic near-duplicate rows for testing/benchmark:
    every image ref whose blake2b seed % ``every`` == 0 gains a twin row
    (``ref + "#dup"``) whose payload is the SAME decoded raster re-encoded
    losslessly as BMP (optionally with +/-``noise`` uniform pixel jitter,
    ref-seeded).  A production corpus has organic re-encodes; the synthetic
    tables need them planted so the pHash query returns meaningful pairs."""
    from ..functions import media_codecs as mc

    def _f(batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        others = [
            batch.column(c).to_pylist()
            for c in batch.schema.names
            if c not in ("media_ref", "kind", "payload", "fmt")
        ]
        other_names = [
            c for c in batch.schema.names if c not in ("media_ref", "kind", "payload", "fmt")
        ]
        fmts = batch.column("fmt").to_pylist() if "fmt" in batch.schema.names else [""] * len(refs)
        out = {c: list(v) for c, v in zip(other_names, others)}
        out_ref, out_kind, out_pay, out_fmt = list(refs), list(kinds), list(payloads), list(fmts)
        for i, (ref, kind, buf) in enumerate(zip(refs, kinds, payloads)):
            if kind != "image":
                continue
            seed = int.from_bytes(hashlib.blake2b(ref.encode(), digest_size=4).digest(), "big")
            if seed % every:
                continue
            img = mc.decode_image(buf).astype(np.int64)
            if noise:
                rng = np.random.RandomState(seed ^ 0xA5A5)
                img = img + rng.randint(-noise, noise + 1, img.shape)
            twin = mc.encode_bmp(np.clip(img, 0, 255).astype(np.uint8))
            out_ref.append(ref + "#dup")
            out_kind.append("image")
            out_pay.append(twin)
            out_fmt.append("bmp")
            for c in other_names:
                out[c].append(out[c][i])
        cols = {"media_ref": pa.array(out_ref, pa.string()), "kind": pa.array(out_kind, pa.string())}
        for c in other_names:
            cols[c] = pa.array(out[c], batch.schema.field(c).type)
        cols["payload"] = pa.array(out_pay, pa.binary())
        cols["fmt"] = pa.array(out_fmt, pa.string())
        return pa.table(cols)

    return media_with_payloads.map_batches(_f, batch_format="pyarrow", batch_size=64)


_DCT64 = _dct_basis(64)


def ahash64(samples: np.ndarray, rate: int) -> int:
    """64-bit perceptual hash of decoded PCM audio — the audio analog of
    :func:`phash64` (DCT-sign recipe over the log band spectrum).

    Deterministic pure-numpy: mono mixdown -> fixed 4096-sample window
    (truncate/zero-pad) -> full-window rfft power -> 64 log-spaced
    frequency bands -> peak-normalize (volume invariance) -> log with a
    -40 dB relative floor (sub-floor broadband noise is invisible, the
    tonal-content trap a framed spectrogram falls into) -> 64-point
    DCT-II -> signs of coefficients 1..64 (DC skipped) packed MSB-first
    into a SIGNED int64 (the phash/SimHash column convention).

    Lossless re-encodes hash identically; volume scaling is exactly
    invariant; mild noise moves a few bits; different tonal content
    lands in different bands and flips many DCT signs.  ``rate`` is
    accepted for interface parity (bands are relative to the window
    spectrum)."""
    x = samples.astype(np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = 4096
    x = x[:n] if len(x) >= n else np.pad(x, (0, n - len(x)))
    P = np.abs(np.fft.rfft(x)) ** 2  # 2049 bins
    edges = np.round(np.geomspace(2, len(P) - 1, 65)).astype(np.int64)
    idx = np.clip(np.searchsorted(edges, np.arange(len(P)), side="right") - 1,
                  -1, 63)
    B = np.zeros(64)
    valid = idx >= 0
    np.add.at(B, idx[valid], P[valid])
    peak = B.max()
    if peak > 0:
        B = B / peak
    L = np.log(np.maximum(B, 1e-4))
    coef = _DCT64 @ L
    bits = coef[1:65] > 0
    packed = np.packbits(bits.astype(np.uint8)).tobytes()
    return int.from_bytes(packed, "big", signed=True)


class AHasher:
    """Actor-pool stage: audio payload bytes -> (ahash: int64, ahash_ok).
    Per-row quarantine like :class:`PHasher` — a corrupt WAV never
    poisons the batch."""

    def __init__(self):
        from ..functions import media_codecs as mc

        self.mc = mc

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes, ok = [], []
        for buf in batch.column("payload").to_pylist():
            try:
                samples, rate = self.mc.decode_wav(buf)
                hashes.append(ahash64(samples, rate))
                ok.append(True)
            except Exception:
                hashes.append(0)
                ok.append(False)
        return (
            batch.drop_columns(["payload"])
            .append_column("ahash", pa.array(hashes, pa.int64()))
            .append_column("ahash_ok", pa.array(ok, pa.bool_()))
        )


def ahash_media(media_with_payloads, concurrency: int = 8, batch_size: int = 32):
    """Hash every AUDIO row of a media+payload table."""
    auds = media_with_payloads.filter(expr="kind == 'audio'")
    return auds.map_batches(
        AHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def audio_fingerprint_pairs(
    media_with_payloads,
    max_hamming: int = 6,
    concurrency: int = 8,
    num_parts: int = 64,
):
    """Near-duplicate audio pairs (a, b, hamming), a < b by media_ref —
    the audio face of the near-dup stack (:func:`phash_image_pairs` /
    ``dedup.simhash_pairs``), identical scale shape: 4x16-bit band LSH
    buckets (pigeonhole-exact at hamming <= 3), bucket-local popcount
    verify, cross-band Min collapse.  No all-pairs work, no driver
    materialization; decode runs in the AHasher actor pool."""
    import pandas as pd
    from ray.data.aggregate import Min

    from .grouping import hamming_pairs_frame, partitioned_map_groups

    sigs = ahash_media(media_with_payloads, concurrency=concurrency)

    def _explode(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch.column("ahash_ok"))
        n = len(batch)
        sims = batch.column("ahash").to_numpy(zero_copy_only=False).astype(np.int64)
        u = sims.view(np.uint64) ^ np.uint64(1 << 63)
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
        keys = ((u[:, None] >> shifts) & np.uint64(0xFFFF)).reshape(-1)
        take_idx = pa.array(np.repeat(np.arange(n), 4), pa.int64())
        return pa.table(
            {
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_key": pa.array(keys.astype(np.int64), pa.int64()),
                "media_ref": batch.column("media_ref").take(take_idx),
                "ahash": pa.array(np.repeat(sims, 4), pa.int64()),
            }
        )

    buckets = sigs.map_batches(_explode, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        return hamming_pairs_frame(g, "media_ref", "ahash", max_hamming)

    pairs = partitioned_map_groups(
        buckets, ["band_id", "band_key"], _pairs, num_parts=num_parts
    )
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


def plant_audio_dup_payloads(
    media_with_payloads, every: int = 4, noise: int = 0, gain: float = 1.0
):
    """Append deterministic audio near-dup twins: every audio ref whose
    blake2b seed % ``every`` == 0 gains a twin row (``ref + "#dup"``)
    whose payload is the SAME decoded samples re-encoded as PCM WAV,
    optionally with +/-``noise`` int16 jitter (ref-seeded) and a
    ``gain`` volume scale — the audio face of
    :func:`plant_near_dup_payloads`."""
    from ..functions import media_codecs as mc

    def _f(batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        other_names = [
            c for c in batch.schema.names
            if c not in ("media_ref", "kind", "payload", "fmt")
        ]
        out = {c: batch.column(c).to_pylist() for c in other_names}
        fmts = (
            batch.column("fmt").to_pylist()
            if "fmt" in batch.schema.names else [""] * len(refs)
        )
        out_ref, out_kind = list(refs), list(kinds)
        out_pay, out_fmt = list(payloads), list(fmts)
        for i, (ref, kind, buf) in enumerate(zip(refs, kinds, payloads)):
            if kind != "audio":
                continue
            seed = int.from_bytes(
                hashlib.blake2b(ref.encode(), digest_size=4).digest(), "big"
            )
            if seed % every:
                continue
            samples, rate = mc.decode_wav(buf)
            s = samples.astype(np.float64) * gain
            if noise:
                rng = np.random.RandomState(seed ^ 0x5A5A)
                s = s + rng.randint(-noise, noise + 1, s.shape)
            twin = mc.encode_wav(
                np.clip(s, -32768, 32767).astype(np.int16), rate=rate
            )
            out_ref.append(ref + "#dup")
            out_kind.append("audio")
            out_pay.append(twin)
            out_fmt.append("wav")
            for c in other_names:
                out[c].append(out[c][i])
        cols = {
            "media_ref": pa.array(out_ref, pa.string()),
            "kind": pa.array(out_kind, pa.string()),
        }
        for c in other_names:
            cols[c] = pa.array(out[c], batch.schema.field(c).type)
        cols["payload"] = pa.array(out_pay, pa.binary())
        cols["fmt"] = pa.array(out_fmt, pa.string())
        return pa.table(cols)

    return media_with_payloads.map_batches(_f, batch_format="pyarrow", batch_size=64)


def vhash64(frames, max_frames: int = 8) -> int:
    """64-bit perceptual hash of a decoded video — the video face of the
    near-dup trio (:func:`phash64` images, :func:`ahash64` audio):
    sample up to ``max_frames`` frames evenly across the clip, pHash each,
    and take the per-bit MAJORITY across the sampled frame hashes (ties
    round to 1, deterministic).  MJPEG re-encodes of the same frames hash
    identically in practice (per-frame pHash absorbs the quantization;
    the majority fold absorbs any residual single-frame flips); unrelated
    clips are ~32 bits apart.  Packed MSB-first into a SIGNED int64 (the
    repo hash-column convention)."""
    if not len(frames):
        raise ValueError("empty frame list")
    idx = np.unique(
        np.linspace(0, len(frames) - 1, min(len(frames), int(max_frames)))
        .round()
        .astype(int)
    )
    hs = np.array(
        [phash64(frames[i]) for i in idx], dtype=np.int64
    ).view(np.uint64)
    bytes_mat = hs[:, None].byteswap().view(np.uint8).reshape(len(hs), 8)
    bits = np.unpackbits(bytes_mat, axis=1).astype(np.int64).sum(axis=0)
    maj = (2 * bits >= len(hs)).astype(np.uint8)
    return int.from_bytes(np.packbits(maj).tobytes(), "big", signed=True)


class VHasher:
    """Actor-pool stage: video payload bytes -> (vhash: int64, vhash_ok).
    Per-row quarantine like :class:`PHasher`/:class:`AHasher`."""

    def __init__(self, max_frames: int = 8):
        from ..functions import media_codecs as mc

        self.mc = mc
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes, ok = [], []
        for buf in batch.column("payload").to_pylist():
            try:
                frames, _fps = self.mc.decode_avi_mjpeg(buf)
                hashes.append(vhash64(frames, self.max_frames))
                ok.append(True)
            except Exception:
                hashes.append(0)
                ok.append(False)
        return (
            batch.drop_columns(["payload"])
            .append_column("vhash", pa.array(hashes, pa.int64()))
            .append_column("vhash_ok", pa.array(ok, pa.bool_()))
        )


def vhash_media(media_with_payloads, concurrency: int = 8, batch_size: int = 16):
    """Hash every VIDEO row of a media+payload table (small batches: video
    payloads are the largest binaries in the corpus)."""
    vids = media_with_payloads.filter(expr="kind == 'video'")
    return vids.map_batches(
        VHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def video_fingerprint_pairs(
    media_with_payloads,
    max_hamming: int = 3,
    concurrency: int = 8,
    num_parts: int = 64,
):
    """Near-duplicate video pairs (a, b, hamming), a < b by media_ref —
    identical scale shape to :func:`phash_image_pairs` /
    :func:`audio_fingerprint_pairs`: 4x16-bit band LSH buckets
    (pigeonhole-exact at hamming <= 3), bucket-local popcount verify,
    cross-band Min collapse; decode runs in the VHasher actor pool."""
    import pandas as pd
    from ray.data.aggregate import Min

    from .grouping import hamming_pairs_frame, partitioned_map_groups

    sigs = vhash_media(media_with_payloads, concurrency=concurrency)

    def _explode(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch.column("vhash_ok"))
        n = len(batch)
        sims = batch.column("vhash").to_numpy(zero_copy_only=False).astype(np.int64)
        u = sims.view(np.uint64) ^ np.uint64(1 << 63)
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
        keys = ((u[:, None] >> shifts) & np.uint64(0xFFFF)).reshape(-1)
        take_idx = pa.array(np.repeat(np.arange(n), 4), pa.int64())
        return pa.table(
            {
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_key": pa.array(keys.astype(np.int64), pa.int64()),
                "media_ref": batch.column("media_ref").take(take_idx),
                "vhash": pa.array(np.repeat(sims, 4), pa.int64()),
            }
        )

    buckets = sigs.map_batches(_explode, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        return hamming_pairs_frame(g, "media_ref", "vhash", max_hamming)

    pairs = partitioned_map_groups(
        buckets, ["band_id", "band_key"], _pairs, num_parts=num_parts
    )
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


def plant_video_dup_payloads(media_with_payloads, every: int = 3):
    """Append deterministic video near-dup twins: every video ref whose
    blake2b seed % ``every`` == 0 gains a twin row (``ref + "#dup"``)
    whose payload is the SAME decoded frames re-encoded as AVI-MJPEG —
    the organic re-encode a production corpus carries."""
    from ..functions import media_codecs as mc

    def _f(batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        other_names = [
            c for c in batch.schema.names
            if c not in ("media_ref", "kind", "payload", "fmt")
        ]
        out = {c: batch.column(c).to_pylist() for c in other_names}
        fmts = (
            batch.column("fmt").to_pylist()
            if "fmt" in batch.schema.names else [""] * len(refs)
        )
        out_ref, out_kind = list(refs), list(kinds)
        out_pay, out_fmt = list(payloads), list(fmts)
        for i, (ref, kind, buf) in enumerate(zip(refs, kinds, payloads)):
            if kind != "video":
                continue
            seed = int.from_bytes(
                hashlib.blake2b(ref.encode(), digest_size=4).digest(), "big"
            )
            if seed % every:
                continue
            frames, fps = mc.decode_avi_mjpeg(buf)
            twin = mc.encode_avi_mjpeg(frames, fps=fps)
            out_ref.append(ref + "#dup")
            out_kind.append("video")
            out_pay.append(twin)
            out_fmt.append("avi")
            for c in other_names:
                out[c].append(out[c][i])
        cols = {
            "media_ref": pa.array(out_ref, pa.string()),
            "kind": pa.array(out_kind, pa.string()),
        }
        for c in other_names:
            cols[c] = pa.array(out[c], batch.schema.field(c).type)
        cols["payload"] = pa.array(out_pay, pa.binary())
        cols["fmt"] = pa.array(out_fmt, pa.string())
        return pa.table(cols)

    return media_with_payloads.map_batches(_f, batch_format="pyarrow", batch_size=64)
