"""Analytics tour over the engine's round-2 relational/search surface —
the queries a reference user runs AFTER the CDC pipeline lands their data:

1. sessionize the event log (gaps-and-islands, batch twin of streaming
   session windows);
2. band revenue by overlapping quantity intervals (bucketed range join);
3. rank documents for a term query with BM25 (Lucene/ES default scoring);
4. find near-identical part names (q-gram-blocked fuzzy join);
5. co-locate lineitem/orders as bucketed tables and join with a
   zero-Exchange zero-Sort plan;
6. write the events z-ordered so scans filtered on user_id OR value prune.

Run: python examples/analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.operators.bucketed import (
    bucketed_join,
    write_bucketed,
)
from go_pq_cdc_elasticsearch_spark.operators.fuzzy import fuzzy_self_join
from go_pq_cdc_elasticsearch_spark.operators.layout import write_zordered
from go_pq_cdc_elasticsearch_spark.operators.ranges import (
    bucketed_range_join,
    sessionize,
)
from go_pq_cdc_elasticsearch_spark.operators.ranking import bm25_topk
from go_pq_cdc_elasticsearch_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example-analytics", cpus=4)
    work = tempfile.mkdtemp(prefix="ex_analytics_")

    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    print("== sessions (30-min gap) ==")
    sess = sessionize(events, ts_col="ts", key_col="user_id", gap_seconds=1800)
    sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    ).orderBy(F.col("n_events").desc()).show(5)

    print("== revenue by overlapping quantity band (range join) ==")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("v"),
        F.col("l_extendedprice").alias("price"),
    )
    bands = spark.range(10).select(
        F.col("id").alias("band"),
        (F.col("id") * 5).cast("double").alias("lo"),
        (F.col("id") * 5 + 10).cast("double").alias("hi"),
    )
    bucketed_range_join(li, bands, "v", width=5.0).groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("price"), 2).alias("revenue"),
    ).orderBy("band").show(5)

    print("== BM25 search: table merge vector ==")
    bm25_topk(docs, ["table", "merge", "vector"], k=5).show(truncate=False)

    print("== near-duplicate part names (edit distance <= 2) ==")
    names = load_table(spark, sf_dir, "part").select(
        F.col("p_name").alias("s")
    ).distinct()
    fuzzy_self_join(names, text_col="s", id_col="s", max_dist=2).select(
        "s1", "s2", "dist"
    ).show(5, truncate=False)

    print("== co-located bucketed join (no shuffle at query time) ==")
    sfx = uuid.uuid4().hex[:8]
    lt, rt = f"li_{sfx}", f"ord_{sfx}"
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        lt, ["l_orderkey"], n_buckets=4,
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
        ),
        rt, ["l_orderkey"], n_buckets=4,
    )
    j = bucketed_join(spark, lt, rt, ["l_orderkey"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    print("exchanges in plan:", plan.count("Exchange"))
    j.agg(F.count(F.lit(1)).alias("joined_rows")).show()
    spark.sql(f"DROP TABLE {lt}")
    spark.sql(f"DROP TABLE {rt}")

    print("== z-ordered layout (prunes on user_id OR value alone) ==")
    zpath = os.path.join(work, "events_z")
    write_zordered(
        events.select("event_id", "user_id", "value"), zpath,
        ["user_id", "value"], n_files=4,
    )
    # filter on the SECOND curve column ALONE: that is what distinguishes
    # a z-ordered layout from a plain sort by user_id (a conjunction of
    # both columns would prune acceptably under either layout and prove
    # nothing — review r5)
    spark.read.parquet(zpath).filter(F.col("value") < 10).agg(
        F.count(F.lit(1)).alias("value_only_pruned_rows")
    ).show()
    spark.read.parquet(zpath).filter(F.col("user_id") < 50).agg(
        F.count(F.lit(1)).alias("user_only_pruned_rows")
    ).show()


if __name__ == "__main__":
    main(*sys.argv[1:])
