"""Pure-stdlib/numpy media codecs for the multimodal operators.

The container ships no PIL/ffmpeg, but three formats are fully decodable
with ``struct``/``wave``/numpy alone — enough to make the multimodal
pipeline's decode branch REAL instead of stubbed:

- BMP  (24-bit uncompressed BI_RGB, the classic Windows header)
- PPM  (P6 binary RGB)
- WAV  (16-bit PCM via the stdlib ``wave`` module)

Each codec has an encoder too, so tests generate real fixtures and
round-trip them. Detection is by magic bytes, like any real ingest path.
"""

from __future__ import annotations

import io
import struct

import numpy as np

# ship by value for Spark workers (same rationale as operators/multimodal.py)
try:
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass


def sniff_format(blob: bytes) -> str | None:
    """'bmp' | 'ppm' | 'wav' | None by magic bytes."""
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:2] == b"P6":
        return "ppm"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    return None


# ---- BMP (24bpp, BI_RGB) ---------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BMP bytes (rows bottom-up, BGR,
    4-byte padded — the actual on-disk format)."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) // 4 * 4
    image_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows.tobytes()


def decode_bmp(blob: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    w, h = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: {bpp}bpp compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(blob, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---- PPM (P6) --------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    """P6 PPM bytes -> (h, w, 3) uint8 RGB. Returns the pixel array; use
    ppm_frame_length to know where a frame ends inside a concatenated
    stream."""
    pixels, _ = _decode_ppm_at(blob, 0)
    return pixels


def _decode_ppm_at(blob: bytes, offset: int) -> tuple[np.ndarray, int]:
    if blob[offset : offset + 2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: magic, whitespace-separated width/height/maxval (no comments
    # in our encoder; real-world '#' comments rejected explicitly)
    pos = offset + 2
    end = len(blob)
    fields = []
    while len(fields) < 3:
        while pos < end and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            raise ValueError("PPM comments unsupported")
        start = pos
        # bound by end: past-EOF b''.isspace() is False, so an unbounded
        # scan on a truncated header never terminates (task-level hang)
        while pos < end and not blob[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(blob[start:pos]))
    if pos >= end:
        raise ValueError("truncated PPM header")
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    n = w * h * 3
    pixels = np.frombuffer(blob, dtype=np.uint8, count=n, offset=pos).reshape(h, w, 3)
    return pixels.copy(), pos + n


def decode_ppm_stream(blob: bytes) -> list[np.ndarray]:
    """Concatenated P6 frames (our toy video container) -> list of frames."""
    frames = []
    pos = 0
    while pos < len(blob):
        frame, pos = _decode_ppm_at(blob, pos)
        frames.append(frame)
    return frames


# ---- WAV (16-bit PCM) ------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """1-D int16 samples -> mono 16-bit PCM WAV bytes (stdlib wave)."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples int16 (n, channels), rate)."""
    import wave

    with wave.open(io.BytesIO(blob), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        n = wf.getnframes()
        raw = wf.readframes(n)
        rate = wf.getframerate()
        ch = wf.getnchannels()
    samples = np.frombuffer(raw, dtype="<i2").reshape(n, ch)
    return samples, rate


# ---- shared feature extraction --------------------------------------------

def image_features(pixels: np.ndarray, dim: int) -> list[float]:
    """Deterministic stats vector: [w, h, mean_r, mean_g, mean_b, std,
    min, max] padded/truncated to dim."""
    h, w, _ = pixels.shape
    p = pixels.astype(np.float64)
    feats = [
        float(w),
        float(h),
        float(p[:, :, 0].mean()),
        float(p[:, :, 1].mean()),
        float(p[:, :, 2].mean()),
        float(p.std()),
        float(p.min()),
        float(p.max()),
    ]
    return (feats + [0.0] * dim)[:dim]


def audio_features(samples: np.ndarray, rate: int, dim: int) -> list[float]:
    """[n_samples, rate, mean, std, min, max, rms, zero_crossings].

    A zero-frame WAV is valid — all sample-derived stats are 0.0 instead
    of the ValueError numpy's min()/max() raise on empty arrays (and the
    NaNs mean()/std() would emit)."""
    mono = samples.astype(np.float64).mean(axis=1) if len(samples) else (
        np.zeros(0)
    )
    if len(mono) == 0:
        return ([0.0, float(rate)] + [0.0] * dim)[:dim]
    feats = [
        float(len(mono)),
        float(rate),
        float(mono.mean()),
        float(mono.std()),
        float(mono.min()),
        float(mono.max()),
        float(np.sqrt((mono**2).mean())),
        float(((mono[:-1] * mono[1:]) < 0).sum()),
    ]
    return (feats + [0.0] * dim)[:dim]


def decode_features(blob: bytes, dim: int) -> list[float] | None:
    """Sniff + decode + feature-extract; None when the format is not one of
    the supported real codecs (caller decides whether to stub or raise)."""
    fmt = sniff_format(blob or b"")
    if fmt == "bmp":
        return image_features(decode_bmp(blob), dim)
    if fmt == "ppm":
        return image_features(decode_ppm(blob), dim)
    if fmt == "wav":
        samples, rate = decode_wav(blob)
        return audio_features(samples, rate, dim)
    return None
