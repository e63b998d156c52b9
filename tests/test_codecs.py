"""Real multimodal decode path (VERDICT round 1 item 8): BMP/PPM/WAV
codecs round-trip on generated fixtures, and the Spark operators run them
through the real (non-stub) branch."""

import numpy as np
import pytest

from go_pq_cdc_elasticsearch_spark.operators import codecs as C
from go_pq_cdc_elasticsearch_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
)


def _pixels(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip():
    for h, w in ((5, 5), (3, 7), (1, 1), (16, 2)):  # odd widths hit row padding
        px = _pixels(h, w)
        assert np.array_equal(C.decode_bmp(C.encode_bmp(px)), px), (h, w)


def test_ppm_roundtrip():
    px = _pixels(9, 4)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(px)), px)


def test_wav_roundtrip():
    samples = (np.sin(np.linspace(0, 40, 800)) * 20000).astype(np.int16)
    out, rate = C.decode_wav(C.encode_wav(samples, rate=8000))
    assert rate == 8000
    assert np.array_equal(out[:, 0], samples)


def test_sniff():
    assert C.sniff_format(C.encode_bmp(_pixels(2, 2))) == "bmp"
    assert C.sniff_format(C.encode_ppm(_pixels(2, 2))) == "ppm"
    assert C.sniff_format(C.encode_wav(np.zeros(4, np.int16))) == "wav"
    assert C.sniff_format(b"plain text") is None


def test_ppm_stream():
    frames = [_pixels(4, 4, s) for s in range(5)]
    blob = b"".join(C.encode_ppm(f) for f in frames)
    got = C.decode_ppm_stream(blob)
    assert len(got) == 5
    assert all(np.array_equal(a, b) for a, b in zip(got, frames))


def _media_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, meta map<string,string>",
    )


def test_real_feature_extraction_in_spark(spark):
    img = C.encode_bmp(_pixels(6, 8))
    ppm = C.encode_ppm(_pixels(3, 3, seed=1))
    wav = C.encode_wav((np.arange(100) % 50 * 100).astype(np.int16), rate=16000)
    df = _media_df(
        spark,
        [(1, "image", img, {}), (2, "image", ppm, {}), (3, "audio", wav, {})],
    )
    got = {r["media_id"]: r for r in extract_features(df, decode_stub=False).collect()}
    assert got[1]["features"][0] == 8.0 and got[1]["features"][1] == 6.0  # w, h
    assert got[2]["features"][0] == 3.0
    assert got[3]["features"][0] == 100.0 and got[3]["features"][1] == 16000.0
    # stats are real pixel math, not hashes
    px = _pixels(6, 8)
    assert got[1]["features"][2] == pytest.approx(px[:, :, 0].astype(float).mean())


def test_real_feature_extraction_rejects_unknown_format(spark):
    df = _media_df(spark, [(1, "image", b"\x89PNG\r\n\x1a\nxxxx", {})])
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        extract_features(df, decode_stub=False).collect()


def test_real_resize_in_spark(spark):
    px = _pixels(8, 8)
    df = _media_df(spark, [(1, "image", C.encode_bmp(px), {"k": "v"})])
    out = resize_images(df, width=4, height=2, decode_stub=False).collect()[0]
    resized = C.decode_bmp(bytes(out["content"]))
    assert resized.shape == (2, 4, 3)
    # nearest-neighbor: top-left pixel preserved
    assert np.array_equal(resized[0, 0], px[0, 0])
    assert out["meta"]["resized"] == "4x2"


def test_real_frame_sampling_in_spark(spark):
    frames = [_pixels(2, 2, s) for s in range(6)]
    blob = b"".join(C.encode_ppm(f) for f in frames)
    df = _media_df(spark, [(1, "video", blob, {})])
    out = sample_frames(df, decode_stub=False, every_nth_frame=2).collect()
    assert [r["frame_idx"] for r in out] == [0, 1, 2]  # frames 0, 2, 4
    got0 = C.decode_ppm(bytes(out[0]["frame"]))
    assert np.array_equal(got0, frames[0])
    got2 = C.decode_ppm(bytes(out[2]["frame"]))
    assert np.array_equal(got2, frames[4])


def test_truncated_ppm_header_raises_not_hangs():
    """A header cut mid-field used to spin forever: past-EOF b'' is not
    .isspace(), so the unbounded field scan never terminated (task-level
    hang on one malformed row). Every truncation point must raise."""
    import pytest

    from go_pq_cdc_elasticsearch_spark.operators import codecs as C

    good = C.encode_ppm(__import__("numpy").zeros((2, 3, 3)))
    for cut in (2, 3, 5, len(good.split(b"\n", 3)[0]) + 3):
        with pytest.raises(ValueError):
            C.decode_ppm(good[:cut])
    # and the full frame still round-trips
    assert C.decode_ppm(good).shape == (2, 3, 3)
