"""Real media decode/resample kernels — stdlib + numpy ONLY.

The container has no PIL/cv2/ffmpeg, so compressed formats (JPEG/PNG/MP4)
stay behind the gated ``backend="real"`` seam in ``stages/multimodal``.
Uncompressed formats need no external codec, and a 100 TB pipeline's decode
stage is exactly this shape regardless of format: bytes in, array out, one
pure function per format dispatched by magic number.  Implemented here:

* P6 PPM  (``P6`` magic)   -> (h, w, 3) uint8
* 24-bit uncompressed BMP (``BM`` magic, BI_RGB) -> (h, w, 3) uint8
* PCM WAV (``RIFF`` magic, stdlib ``wave``)      -> (n, channels) int16 + rate

plus a deterministic nearest-neighbor letterbox resize (a real resampler,
not a geometry estimate) and fixed-dim feature kernels over decoded pixels
/ samples.  Encoders for the same formats exist so tests round-trip without
any fixture files.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


# ---------------------------------------------------------------- PPM (P6)

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM bytes."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary P6 PPM -> (h, w, 3) uint8.  Handles comment lines and any
    whitespace between header tokens (the format's only flexibility)."""
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    data = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


# ------------------------------------------------------- BMP (24-bit BI_RGB)

def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP bytes."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += arr[y, :, ::-1].tobytes() + pad  # BGR order
    return header + bytes(rows)


def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB (top-down array)."""
    if not buf.startswith(b"BM"):
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP core headers unsupported")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=row_size * h, offset=data_off
    ).reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return rgb[::-1] if bottom_up else rgb


# ------------------------------------------------------------ WAV (PCM s16)

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 -> PCM WAV bytes (stdlib wave)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    assert samples.dtype == np.int16
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> ((n, ch) int16, sample_rate)."""
    with wave.open(io.BytesIO(buf), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        n, ch, rate = wf.getnframes(), wf.getnchannels(), wf.getframerate()
        data = np.frombuffer(wf.readframes(n), dtype=np.int16).reshape(n, ch)
    return data, rate


# ------------------------------------------------------------------ dispatch

def decode_image(buf: bytes) -> np.ndarray:
    """Magic-number dispatch over the stdlib-decodable image formats."""
    if buf.startswith(b"P6"):
        return decode_ppm(buf)
    if buf.startswith(b"BM"):
        return decode_bmp(buf)
    raise NotImplementedError(
        "compressed image formats need PIL/cv2 (absent in this container); "
        "supported here: P6 PPM, 24-bit BMP"
    )


# ----------------------------------------------------------------- kernels

def letterbox_resize(img: np.ndarray, target: int) -> tuple[np.ndarray, float]:
    """Aspect-preserving nearest-neighbor resize so max(h, w) == target.
    Deterministic (pure integer index math) — the real-resample counterpart
    of MediaResizer's geometry: returns (resized (h', w', 3), scale)."""
    h, w = img.shape[:2]
    s = target / max(h, w)
    h1, w1 = max(1, round(h * s)), max(1, round(w * s))
    yi = np.minimum((np.arange(h1) / s).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(w1) / s).astype(np.int64), w - 1)
    return img[yi][:, xi], s


def image_features(img: np.ndarray, dim: int = 8) -> np.ndarray:
    """Decoded pixels -> fixed ``dim`` feature vector: mean RGB (3) +
    luminance histogram over ``dim - 3`` bins, all in [0, 1]."""
    px = img.reshape(-1, 3).astype(np.float64)
    mean_rgb = px.mean(axis=0) / 255.0
    lum = px @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=dim - 3, range=(0.0, 255.0))
    hist = hist / max(1, len(lum))
    return np.concatenate([mean_rgb, hist])


def audio_features(samples: np.ndarray, rate: int, dim: int = 8) -> np.ndarray:
    """Decoded PCM -> fixed ``dim`` vector: duration (s), RMS, zero-crossing
    rate, then per-segment RMS over ``dim - 3`` equal time slices."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = len(mono)
    dur = n / rate
    rms = float(np.sqrt((mono**2).mean())) if n else 0.0
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
    segs = np.array_split(mono, dim - 3) if n else [np.zeros(1)] * (dim - 3)
    seg_rms = [float(np.sqrt((s**2).mean())) if len(s) else 0.0 for s in segs]
    return np.array([dur, rms, zcr, *seg_rms])
