"""Z-order layout: clustering quality measured from real parquet footers."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.operators.layout import write_zordered

SF = "/root/testdata/sf0.01"


def _per_file_span_fraction(path: str, col: str) -> float:
    """Mean (file min/max span) / (global span) across data files — 1.0
    means every file covers the whole range (no pruning possible), small
    means tight clustering."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    mins, maxs = [], []
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    v0, v1 = c.statistics.min, c.statistics.max
                    fmin = v0 if fmin is None else min(fmin, v0)
                    fmax = v1 if fmax is None else max(fmax, v1)
        assert fmin is not None, f"no stats for {col} in {f}"
        mins.append(fmin)
        maxs.append(fmax)
    g = max(maxs) - min(mins) or 1
    return sum((b - a) / g for a, b in zip(mins, maxs)) / len(mins)


def test_zorder_clusters_both_columns(spark):
    work = tempfile.mkdtemp(prefix="zorder_")
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    zpath = os.path.join(work, "z")
    write_zordered(ev, zpath, ["user_id", "value"], n_files=8)

    # rows survive intact
    assert spark.read.parquet(zpath).count() == ev.count()
    got = spark.read.parquet(zpath).agg(F.sum("event_id")).collect()[0][0]
    want = ev.agg(F.sum("event_id")).collect()[0][0]
    assert got == want

    # baseline: same data, same file count, arrival order
    bpath = os.path.join(work, "base")
    ev.repartition(8).write.parquet(bpath)

    for col in ("user_id", "value"):
        zfrac = _per_file_span_fraction(zpath, col)
        bfrac = _per_file_span_fraction(bpath, col)
        # every z file covers a small slice of BOTH dimensions; the
        # random layout's files each cover ~the full range
        assert zfrac < 0.55, (col, zfrac)
        assert zfrac < bfrac * 0.6, (col, zfrac, bfrac)


def test_zorder_beats_single_column_sort_on_second_dim(spark):
    work = tempfile.mkdtemp(prefix="zorder2_")
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    zpath = os.path.join(work, "z")
    spath = os.path.join(work, "s")
    write_zordered(ev, zpath, ["user_id", "value"], n_files=8)
    # classic single-column sort: user_id tight, value full-width per file
    ev.repartitionByRange(8, "user_id").sortWithinPartitions(
        "user_id"
    ).write.parquet(spath)
    z_value = _per_file_span_fraction(zpath, "value")
    s_value = _per_file_span_fraction(spath, "value")
    assert z_value < s_value * 0.8, (z_value, s_value)


def test_zorder_key_rejects_long_overflow(spark):
    import pytest

    from go_pq_cdc_elasticsearch_spark.operators.layout import zorder_key

    with pytest.raises(ValueError, match="overflows"):
        zorder_key([F.col("a")] * 4, [(0.0, 1.0)] * 4, bits=16)


def test_write_zordered_empty_and_all_null(spark):
    # empty input and all-NULL z-columns must not crash on missing stats;
    # 4 columns at the default bits auto-cap to fit the long key
    with tempfile.TemporaryDirectory() as d:
        empty = spark.createDataFrame([], "a double, b double, c double, e double")
        write_zordered(empty, os.path.join(d, "empty"), ["a", "b", "c", "e"])
        nulls = spark.createDataFrame(
            [(None, 1.0), (None, 2.0)], "a double, b double"
        )
        write_zordered(nulls, os.path.join(d, "nulls"), ["a", "b"])
        got = spark.read.parquet(os.path.join(d, "nulls")).collect()
        assert sorted(r["b"] for r in got) == [1.0, 2.0]


def test_zorder_stats_survive_nan_and_inf(spark, tmp_path):
    """Review r7: one NaN made Spark's max() return NaN (NaN sorts
    largest), flattening EVERY row's grid cell to 0 — the Morton key
    interleaved a constant and scans pruned nothing. Stats are now
    finite-only."""
    import pyarrow.parquet as pq

    from go_pq_cdc_elasticsearch_spark.operators.layout import write_zordered

    df = spark.createDataFrame(
        [(float(i), float(i)) for i in range(1000)]
        + [(float("nan"), 1.0), (float("inf"), 2.0)],
        "a double, b double",
    )
    out = str(tmp_path / "z")
    write_zordered(df, out, ["a", "b"], n_files=4)
    import glob

    files = glob.glob(out + "/*.parquet")
    assert len(files) > 1
    # finite rows must spread across files with DISJOINT-ish a-ranges
    # (the pruning property); a constant grid would put one file with
    # everything or identical min/max spans everywhere
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        sch = pq.read_schema(f)
        idx = sch.names.index("a")
        st = md.row_group(0).column(idx).statistics
        if st and st.has_min_max:
            spans.append((st.min, st.max))
    spans = [s for s in spans if s[0] == s[0]]  # drop NaN-min groups
    assert len({s for s in spans}) > 1  # genuinely clustered, not constant


def test_write_zordered_reserved_name_and_empty_cols(spark, tmp_path):
    """Review r9: the same reserved-name discipline the other operators
    carry — a caller column named __z would be silently overwritten by
    the curve key and then dropped from the written output; an empty
    curve-column list would write a constant-key 'clustered' layout."""
    import pytest

    df = spark.range(4).selectExpr("id AS a", "id AS __z")
    with pytest.raises(ValueError, match="__z"):
        write_zordered(df, str(tmp_path / "zz"), ["a"])
    with pytest.raises(ValueError, match="at least one curve column"):
        write_zordered(spark.range(4), str(tmp_path / "zz"), [])
