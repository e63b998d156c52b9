"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side design (all real and tested): media rows are
``(media_id, kind, content binary, meta map<string,string>)``; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
operators so each partition processes a column of byte blobs vectorized —
the shape that scales (no per-row Python calls, no driver transfer).

Decode paths:
- ``decode_stub=False`` (REAL): BMP / PPM / WAV blobs are decoded with the
  stdlib/numpy codecs in operators/codecs.py — real pixels/samples, real
  stats features, real nearest-neighbor resize, real frame slicing. Only a
  format outside that set (JPEG/PNG/MP4 — the container has no PIL/ffmpeg)
  raises NotImplementedError, at the exact point the library call would go.
- ``decode_stub=True``: a deterministic md5-derived "decoder" for opaque
  blobs, so schemas, batch shapes, partitioning and determinism stay
  exercised with arbitrary bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_pq_cdc_elasticsearch_spark.operators import codecs

# mapInPandas closures below reference module-level helpers; ship this
# module BY VALUE so Python workers need not have the repo on sys.path
# (same treatment as sources/wal.py — see that docstring)
try:
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 8


def synthetic_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic media table derived from the documents corpus (the
    container ships no binary fixtures): content = utf-8 bytes of the text,
    meta carries source + length. Exercises the exact binary-column path."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.create_map(
            F.lit("source"), F.col("source"),
            # octet_length, not length: meta n_bytes must equal
            # len(content) in BYTES, and length() counts characters
            # (off for any non-ASCII text)
            F.lit("n_bytes"), F.octet_length("text").cast("string"),
        ).alias("meta"),
    )


def synthetic_bmp_media(docs: DataFrame, side: int = 4) -> DataFrame:
    """Deterministic REAL-codec media table: content is a valid (side x
    side) 24-bit BMP whose pixels are md5-derived from the text — so the
    genuine decode path (codecs.decode_bmp) is exercised end-to-end with
    no binary fixtures in the container. Arrow-batched encode; one map-only
    pass like every media builder here."""

    def build(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        n_px = side * side * 3

        def pixels(text: str) -> np.ndarray:
            raw = b""
            i = 0
            while len(raw) < n_px:
                raw += hashlib.md5(text.encode() + i.to_bytes(2, "big")).digest()
                i += 1
            return np.frombuffer(raw[:n_px], dtype=np.uint8).reshape(
                side, side, 3
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "content": [
                        codecs.encode_bmp(pixels(t)) for t in pdf["text"]
                    ],
                    "meta": [
                        {"source": s, "side": str(side)} for s in pdf["source"]
                    ],
                }
            )

    return docs.select("doc_id", "text", "source").mapInPandas(
        build, schema=MEDIA_SCHEMA
    )


def _stub_features(blob: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake 'decoder': md5 of the bytes -> dim floats in [0,1).
    Stands in for a real embed/decode call; stable across runs/engines."""
    import hashlib

    out = []
    h = blob or b""
    for i in range(dim):
        d = hashlib.md5(h + i.to_bytes(2, "big")).digest()
        out.append(int.from_bytes(d[:8], "big") / 2**64)
    return out


def extract_features(
    media: DataFrame, decode_stub: bool = True, dim: int = FEATURE_DIM
) -> DataFrame:
    """media -> (media_id, kind, features array<double>, n_bytes long)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                if decode_stub:
                    feats.append(_stub_features(b, dim))
                    continue
                real = codecs.decode_features(bytes(b or b""), dim)
                if real is None:
                    raise NotImplementedError(
                        "real decode supports BMP/PPM/WAV here; other formats "
                        "(JPEG/PNG/MP4) need PIL/ffmpeg, absent in this "
                        "environment — use decode_stub=True for opaque blobs"
                    )
                feats.append(real)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                    "n_bytes": [len(b or b"") for b in pdf["content"]],
                }
            )

    return media.mapInPandas(
        run,
        schema="media_id long, kind string, features array<double>, n_bytes long",
    )


def resize_images(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Resize inside the batch loop. Real path (decode_stub=False):
    decode BMP/PPM, nearest-neighbor resample with numpy index arithmetic,
    re-encode in the same format. Stub path: bytes pass through, target
    dims recorded in meta."""
    # fail fast on the driver (same contract as sample_frames' step
    # guards): np.arange(width<=0) is silently EMPTY, so a zero/negative
    # target dimension produced 0x0 images — every downstream decode sees
    # degenerate pixels instead of this call site erroring
    if width <= 0 or height <= 0:
        raise ValueError(
            f"resize_images: target dims must be positive, got {width}x{height}"
        )

    def run(batches: Iterator) -> Iterator:
        import numpy as np

        def real_resize(blob: bytes) -> bytes:
            fmt = codecs.sniff_format(blob)
            if fmt == "bmp":
                px = codecs.decode_bmp(blob)
            elif fmt == "ppm":
                px = codecs.decode_ppm(blob)
            else:
                raise NotImplementedError(
                    "real resize supports BMP/PPM; others need PIL/opencv"
                )
            h, w, _ = px.shape
            rows = (np.arange(height) * h // height).clip(0, h - 1)
            cols = (np.arange(width) * w // width).clip(0, w - 1)
            out = px[rows][:, cols]
            return codecs.encode_bmp(out) if fmt == "bmp" else codecs.encode_ppm(out)

        for pdf in batches:
            pdf = pdf.copy()
            if not decode_stub:
                # b or b"": content is nullable in MEDIA_SCHEMA (same
                # guard as extract_features / sample_frames)
                pdf["content"] = [
                    real_resize(bytes(b or b"")) for b in pdf["content"]
                ]
            pdf["meta"] = [
                {**(m or {}), "resized": f"{width}x{height}"} for m in pdf["meta"]
            ]
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 64,
    decode_stub: bool = True,
    every_nth_frame: int = 1,
) -> DataFrame:
    """Frame sampling: one row per sampled frame — the 1->N expansion shape
    (posexplode after batch decode). Real path (decode_stub=False): the
    blob is a concatenated-P6 "video" (codecs.decode_ppm_stream); every
    ``every_nth_frame``-th frame is re-encoded as standalone PPM bytes.
    Stub path: fixed-size byte slices stand in for decoded frames."""
    # fail fast on the driver: a zero step otherwise dies inside every
    # executor task as range()/slice ValueErrors buried in a Spark task
    # failure stack after the job launched (review r7)
    if every_n_bytes <= 0:
        raise ValueError(f"every_n_bytes must be positive, got {every_n_bytes}")
    if every_nth_frame <= 0:
        raise ValueError(f"every_nth_frame must be positive, got {every_nth_frame}")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob or b"")
                if decode_stub:
                    # same [::every_nth_frame] contract as the real path —
                    # the stub must not silently change sampling behavior
                    # when code is switched to decode_stub=False
                    frames = [
                        blob[off : off + every_n_bytes]
                        for off in range(0, len(blob), every_n_bytes)
                    ][::every_nth_frame]
                else:
                    frames = [
                        codecs.encode_ppm(f)
                        for f in codecs.decode_ppm_stream(blob)[::every_nth_frame]
                    ]
                rows.extend(
                    {"media_id": mid, "frame_idx": fi, "frame": f}
                    for fi, f in enumerate(frames)
                )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(
        run, schema="media_id long, frame_idx int, frame binary"
    )
