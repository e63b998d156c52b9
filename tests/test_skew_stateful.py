"""Salted join equivalence + custom stateful operator equivalence."""

import os
import tempfile

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.operators.skew import salted_join
from go_pq_cdc_elasticsearch_spark.sources.replay import stage_event_files
from go_pq_cdc_elasticsearch_spark.streaming.stateful import running_totals


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "c_mktsegment")
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "k"),
        customer.withColumnRenamed("c_custkey", "k"),
        on=["k"],
        n_salts=4,
    ).select("o_orderkey", "c_mktsegment")
    a = sorted((r[0], r[1]) for r in plain.collect())
    b = sorted((r[0], r[1]) for r in salted.collect())
    assert a == b


def test_salted_join_splits_hot_key(spark):
    # one hot key with 1000 rows: after salting it spans n_salts partitions
    hot = spark.range(1000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(7, "hot")], "k long, name string")
    out = salted_join(hot, dim, on=["k"], n_salts=8)
    assert out.count() == 1000
    # deterministic: same result on rerun
    assert out.count() == 1000


def test_stateful_running_totals_across_batches(spark, sf_dir):
    work = tempfile.mkdtemp(prefix="state_t_")
    staged = os.path.join(work, "staged")
    stage_event_files(spark, sf_dir, staged, n_files=3)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    acc_dir = os.path.join(work, "acc")

    def sink(df, _eid):
        df.write.mode("append").parquet(acc_dir)

    q = (
        running_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.parquet(acc_dir)

    # last emission per key == batch aggregate over all events
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy(F.col("n_events").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "n_events", "total_value")
    )
    got = {
        r["key"]: (r["n_events"], round(r["total_value"], 6))
        for r in final.collect()
    }
    events = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_salted_join_tolerates_nested_map_columns(spark):
    """F.hash rejects MapType RECURSIVELY: a map nested in a struct or
    array is just as unhashable as a top-level map column (the other CDC
    envelope shapes). The salt must skip them, not crash analysis."""
    from go_pq_cdc_elasticsearch_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, {"k": {"a": "1"}}, [{"b": "2"}])],
        "id long, s struct<k:map<string,string>>, a array<map<string,string>>",
    )
    right = spark.createDataFrame([(1, "x")], "id long, v string")
    got = salted_join(left, right, on=["id"], n_salts=4).collect()
    assert len(got) == 1 and got[0]["v"] == "x"


def test_salted_join_disperses_identical_rows_and_validates_n_salts(spark):
    """Review r7: a hot key whose rows are IDENTICAL across hashable
    columns (only the unhashable payload map varies) all hashed to ONE
    salt — the skew survived while paying full replication. The row-id
    mix now disperses them; n_salts<=0 raises instead of silently
    returning zero rows."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.operators.skew import salted_join

    left = (
        spark.range(0, 4000)
        .select(
            F.lit("hot").alias("k"),
            F.lit("upsert").alias("op"),
            F.create_map(F.lit("a"), F.col("id").cast("string")).alias("payload"),
        )
        .repartition(8)
    )
    right = spark.createDataFrame([("hot", 1)], "k string, dim int")
    out = salted_join(left, right, ["k"], n_salts=8)
    assert out.count() == 4000  # correctness unchanged
    # dispersion: recompute the salt expression's distinct count via the
    # join's internal column by re-deriving — assert via partitioning
    # proxy: the salted left must spread the hot key over >1 salt
    salts = (
        left.select(
            F.pmod(
                F.hash("k", "op") + F.monotonically_increasing_id(), F.lit(8)
            ).alias("s")
        )
        .distinct()
        .count()
    )
    assert salts > 1
    with _pytest.raises(ValueError, match="n_salts"):
        salted_join(left, right, ["k"], n_salts=0)


def test_salted_join_reserves_salt_column(spark):
    import pytest as _pytest

    from go_pq_cdc_elasticsearch_spark.operators.skew import salted_join

    l = spark.createDataFrame([(1, 0)], "k int, __salt int")
    r = spark.createDataFrame([(1, "x")], "k int, v string")
    with _pytest.raises(ValueError, match="__salt.*left"):
        salted_join(l, r, ["k"])
    with _pytest.raises(ValueError, match="__salt.*right"):
        salted_join(r, l, ["k"])
