"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side design (all real and tested): media rows are
``(media_id, kind, content binary, meta map<string,string>)``; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
operators so each partition processes a column of byte blobs vectorized —
the shape that scales (no per-row Python calls, no driver transfer).

The actual codec calls are STUBBED (this container has no image/audio
libraries): ``decode_stub=True`` substitutes a deterministic md5-derived
"decoder" so schemas, batch shapes, partitioning and determinism are fully
exercised; ``decode_stub=False`` raises NotImplementedError at the exact
point where PIL/ffmpeg would be invoked.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
            F.lit("n_bytes"), F.length("text").cast("string"),
        ).alias("meta"),
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
            if not decode_stub:
                raise NotImplementedError(
                    "real decode requires an image/audio library (PIL/librosa/"
                    "ffmpeg) not present in this environment; use decode_stub=True"
                )
            feats = [_stub_features(b, dim) for b in pdf["content"]]
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
    """Resize stub: passes bytes through and records the target dims in meta
    (a real impl decodes/resizes/re-encodes inside the same batch loop)."""

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real resize requires PIL/opencv")
            pdf = pdf.copy()
            pdf["meta"] = [
                {**(m or {}), "resized": f"{width}x{height}"} for m in pdf["meta"]
            ]
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Frame-sampling stub for video: emits one row per sampled 'frame'
    (byte-offset slice standing in for a decoded frame) — demonstrates the
    1->N expansion shape (posexplode after batch decode)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = blob or b""
                for fi, off in enumerate(range(0, len(blob), every_n_bytes)):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": fi,
                            "frame": bytes(blob[off : off + every_n_bytes]),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(
        run, schema="media_id long, frame_idx int, frame binary"
    )
