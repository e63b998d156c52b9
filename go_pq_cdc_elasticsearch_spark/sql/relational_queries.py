"""Relational-surface declared queries (SURVEY.md §2.2 Q-S1..Q-S22).

None of these exist in the reference (it has no SQL surface); they are the
analytics capabilities the engine exposes natively via Catalyst. Each query
is written DataFrame-first and kept inside whole-stage codegen (no Python in
the row path except Q-S22, which deliberately tests the pandas_udf path).

Float policy for oracle parity: per-row arithmetic on doubles is IEEE-
deterministic across engines, but large SUMs are order-dependent, so money
sums go through an exact DECIMAL(30,10) cast (identical in DuckDB) and back
to double. Timestamps in result sets are formatted to strings. Rounding is
NEVER the in-engine ``round(x, n)`` (engines disagree on non-representable
decimal ties) — always the portable ``floor(x·10ⁿ + 0.5)`` form from
functions/rounding.py, mirrored verbatim in every oracle.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.functions.rounding import pround
from go_pq_cdc_elasticsearch_spark.functions.rounding import pround_sql as PR
from go_pq_cdc_elasticsearch_spark.operators.asof import asof_join
from go_pq_cdc_elasticsearch_spark.sql.registry import ext_query, query


def _dec_sum(col, alias):
    """Order-independent (exact) sum of a double expression: cast each term
    to DECIMAL(30,10), sum exactly, return double. Matches the oracle's
    CAST(sum(CAST(x AS DECIMAL(30,10))) AS DOUBLE)."""
    return F.sum(col.cast("decimal(30,10)")).cast("double").alias(alias)


@query("q_s1_parquet_scan", oracle="SELECT count(*) AS n FROM lineitem")
def q_s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan; count is answered from row-group metadata."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_s2_filter_project_topk",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS rev
        FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        ORDER BY rev DESC, l_orderkey, l_linenumber LIMIT 20
    """,
)
def q_s2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter (both pushed to the parquet scan) + top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", rev)
        .orderBy(F.col("rev").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


@query(
    "q_s3_join_broadcast",
    oracle="""
        SELECT n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
)
def q_s3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim inner equi-join; dim side broadcast (no shuffle of the fact)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
            "inner",
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_s4_join_multiway_top10",
    oracle="""
        SELECT l_orderkey,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q_s4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style multiway join: broadcast the filtered customer dim,
    shuffle-join orders⋈lineitem on the fact key."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey, "inner"
        )
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q_s5_join_outer",
    oracle="""
        SELECT count(*) AS n_orders_no_items
        FROM orders o LEFT JOIN lineitem l ON o_orderkey = l_orderkey
        WHERE l_orderkey IS NULL
    """,
)
def q_s5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + null probe (orders with no lineitems)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left")
        .filter(F.col("l_orderkey").isNull())
        .agg(F.count(F.lit(1)).alias("n_orders_no_items"))
    )


@query(
    "q_s6_join_semi_anti",
    oracle="""
        SELECT
          (SELECT count(*) FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS semi_n,
          (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS anti_n
    """,
)
def q_s6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) and left-anti (NOT EXISTS) joins."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("semi_n"))
    )
    anti = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("anti_n"))
    )
    return semi.crossJoin(anti)


@query(
    "q_s7_join_theta",
    oracle="""
        SELECT count(*) AS n
        FROM part p JOIN lineitem l
          ON p.p_partkey = l.l_partkey AND l.l_quantity < p.p_size
    """,
)
def q_s7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a range residual (theta) predicate — Catalyst plans the
    equi part as the join key and evaluates the range as a post-filter."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (part.p_partkey == li.l_partkey) & (li.l_quantity < part.p_size)
    return part.join(li, cond, "inner").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_s8_asof_join",
    # correlated PER-ROW form, not JOIN..GROUP BY p.event_id: asof_join
    # emits one output row per LEFT ROW (the standard as-of contract), and
    # the grouped form silently collapsed duplicated purchase rows — an
    # oracle-only uniqueness assumption found by the dup_rel variant
    oracle="""
        SELECT p.event_id,
               strftime((SELECT max(c.ts) FROM events c
                         WHERE c.user_id = p.user_id
                           AND c.event_type = 'click'
                           AND c.ts <= p.ts),
                        '%Y-%m-%d %H:%M:%S.%f') AS asof_ts
        FROM events p
        WHERE p.event_type = 'purchase'
    """,
)
def q_s8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it by the
    same user. Implemented shuffle-once via union+window (operators/asof.py),
    not as a range join."""
    events = load_table(spark, sf_dir, "events")
    # prune BEFORE the join: asof_join unions the left side at full width
    # through its per-key shuffle+sort — dragging event_type/value/props
    # along only to drop them in the final select roughly doubles the
    # shuffled bytes (review r5)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    joined = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts"
    )
    return joined.select(
        "event_id",
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("asof_ts"),
    )


@query(
    "q_s9_tpch_q1",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,10))) AS DOUBLE) AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)
                   / count(l_quantity) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE)
                   / count(l_extendedprice) AS avg_price,
               CAST(sum(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE)
                   / count(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_s9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: partial+final hash aggregation (Catalyst
    emits the map-side partial automatically).

    Averages are the PORTABLE form — exact DECIMAL(30,10) sum cast to
    DOUBLE, then ONE double division by the non-null count, identical
    IEEE on both engines. avg(DECIMAL) itself diverges: Spark divides
    exactly in decimal and HALF_UP-quantizes before the double cast,
    DuckDB double-divides — adjacent doubles near rounding midpoints
    (the q_l2 r5 live failure class; review r7)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity"), "sum_qty"),
        _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
        _dec_sum(disc_price, "sum_disc_price"),
        _dec_sum(charge, "sum_charge"),
        F.when(
            F.count("l_quantity") > 0,
            F.sum(F.col("l_quantity").cast("decimal(30,10)")).cast("double")
            / F.count("l_quantity"),
        ).alias("avg_qty"),
        F.when(
            F.count("l_extendedprice") > 0,
            F.sum(F.col("l_extendedprice").cast("decimal(30,10)")).cast("double")
            / F.count("l_extendedprice"),
        ).alias("avg_price"),
        F.when(
            F.count("l_discount") > 0,
            F.sum(F.col("l_discount").cast("decimal(30,10)")).cast("double")
            / F.count("l_discount"),
        ).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q_s10_count_distinct",
    oracle="SELECT count(DISTINCT l_partkey) AS n FROM lineitem",
)
def q_s10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (two-phase: partial distinct then global)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.countDistinct("l_partkey").alias("n"))


@ext_query(
    "q_s10_approx_distinct",
    oracle="""
        SELECT count(DISTINCT l_partkey) AS n_exact, TRUE AS within_3sigma
        FROM lineitem
    """,
)
def q_s10_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (single pass, mergeable sketches —
    the 100 TB path where exact distinct would shuffle every key).

    Oracle-checked as a BOUNDED claim instead of rows-only: the query
    emits the exact count plus a boolean asserting the sketch landed
    within 3 sigma of it (rsd=0.02 -> 6%); the oracle's TRUE hash-matches
    only when the bound actually held on this engine and data. The exact
    twin runs alongside purely as verification — at 100 TB you'd run only
    the sketch (that's its point)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("__a"),
        F.countDistinct("l_partkey").alias("n_exact"),
    ).select(
        "n_exact",
        # empty input: n_exact 0 makes the ratio an ANSI DIVIDE_BY_ZERO
        # crash (found by the empty_rel variant); the sketch of nothing is
        # exactly right, so the claim is 0 == 0 there
        F.when(F.col("n_exact") == 0, F.col("__a") == F.lit(0))
        .otherwise(
            F.abs(
                F.col("__a").cast("double") / F.col("n_exact").cast("double")
                - F.lit(1.0)
            )
            <= F.lit(0.06)
        )
        .alias("within_3sigma"),
    )


@query(
    "q_s11_rollup",
    oracle="""
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        -- engine-semantics pin (empty_rel variant): Spark's grouping-sets
        -- implementation (Expand-based) emits NO grand-total row over
        -- EMPTY input, while standard SQL/DuckDB emit the () grouping
        -- set's zero row; every row-backed group has count(*) > 0, so
        -- this clause is identity on non-empty input
        HAVING count(*) > 0
    """,
)
def q_s11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup (multi-level aggregate in one pass via grouping sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(_dec_sum(F.col("l_quantity"), "sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "sum_qty",
        )
    )


@query(
    "q_s12_window_rank",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC NULLS LAST,
                                               o_orderkey ASC NULLS LAST) AS rn
            FROM orders)
        WHERE rn <= 3
    """,
)
def q_s12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders by price per customer.

    NULL placement is EXPLICIT on both sides (review r8): Spark's bare
    asc() is NULLS FIRST while DuckDB's default is NULLS LAST, so an
    all-NULL orders row (every column is contractually nullable) ranked
    differently on the tiebreak column — proven divergent by the
    nulls_rel variant."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q_s13_window_running",
    oracle="""
        SELECT event_id, user_id,
               sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS run_sum,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        FROM events WHERE ts IS NOT NULL
    """,
)
def q_s13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window with a row frame (sliding sum) + lag.

    NULL-ts rows are filtered on BOTH sides (the q_s31/q_s46 standing
    rule): Spark windows order NULLS FIRST, DuckDB NULLS LAST, so an
    unfiltered NULL event time shifts every neighbor's lag/run_sum
    (review r7)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    return events.select(
        "event_id",
        "user_id",
        F.sum("value").over(w.rowsBetween(-2, 0)).alias("run_sum"),
        F.lag("value").over(w).alias("prev_value"),
    )


@query(
    "q_s14_topk_orders",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_s14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planned as TakeOrderedAndProject (per-partition heaps,
    no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "q_s15_set_ops",
    oracle="""
        SELECT custkey, except_n, union_n
        FROM (SELECT c_custkey AS custkey FROM customer
              INTERSECT
              SELECT o_custkey AS custkey FROM orders)
        CROSS JOIN (
          SELECT
            (SELECT count(*) FROM (SELECT c_custkey FROM customer
                                   EXCEPT SELECT o_custkey FROM orders)) AS except_n,
            (SELECT count(*) FROM (SELECT c_custkey FROM customer
                                   UNION SELECT o_custkey FROM orders)) AS union_n)
    """,
    doc="Set operations in one entry (folded q_s15_intersect + "
    "q_s15_except_union for the driver's 50-entry window): the INTERSECT "
    "result keeps full row-level parity; EXCEPT/UNION-distinct "
    "cardinalities ride along as constant columns.",
)
def q_s15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT rows + EXCEPT/UNION(distinct) counts."""
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    inter = customer.intersect(orders)
    c = customer.select(F.col("custkey").alias("k"))
    o = orders.select(F.col("custkey").alias("k"))
    ex = c.subtract(o).agg(F.count(F.lit(1)).alias("except_n"))
    un = c.union(o).distinct().agg(F.count(F.lit(1)).alias("union_n"))
    return inter.crossJoin(ex.crossJoin(un))


@query(
    "q_s16_string_funcs",
    oracle="""
        SELECT p_partkey,
               upper(p_brand) AS brand_u,
               substr(p_name, 1, 8) AS name8,
               concat_ws('#', p_brand, p_type) AS bt,
               CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS is_red,
               len(string_split(p_name, ' ')) AS n_words
        FROM part WHERE p_partkey <= 100
    """,
)
def q_s16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions: upper/substr/concat/like/split."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") <= 100).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name8"),
        # concat_ws on BOTH sides: DuckDB's concat(a,'#',b) skips a NULL
        # but keeps the separator ('Brand#'), Spark's concat_ws drops
        # separator AND value ('Brand') — concat_ws has identical
        # null-skipping semantics in both engines (review r5)
        F.concat_ws("#", "p_brand", "p_type").alias("bt"),
        F.when(F.col("p_name").like("%red%"), 1).otherwise(0).alias("is_red"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
    )


@query(
    "q_s17_date_trunc",
    oracle="""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS m,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE) AS total
        FROM orders GROUP BY m
    """,
)
def q_s17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalars: truncate-to-month rollup."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("m")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("o_totalprice"), "total"),
        )
    )


@query(
    "q_s18_math_decimal",
    oracle=(
        "SELECT "
        + PR(
            "CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) "
            "AS DECIMAL(30,10))) AS DOUBLE)",
            2,
        )
        + " AS total_charge, "
        + PR(
            "CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) "
            "/ count(l_quantity)",
            4,
        )
        + """ AS mean_qty,
               CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
               CAST(min(l_extendedprice) AS DOUBLE) AS min_price
        FROM lineitem
    """
    ),
)
def q_s18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math/decimal scalars over an exact decimal aggregate. Rounding is the
    engine-portable floor-half-up (functions/rounding.py) — in-engine
    round() diverges between engines on decimal-tie doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return li.agg(
        pround(F.sum(charge.cast("decimal(30,10)")).cast("double"), 2).alias(
            "total_charge"
        ),
        pround(
            F.when(
                F.count("l_quantity") > 0,
                F.sum(F.col("l_quantity").cast("decimal(30,10)")).cast("double")
                / F.count("l_quantity"),
            ),
            4,
        ).alias("mean_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_extendedprice").alias("min_price"),
    )


@query(
    "q_s19_array_funcs",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS emb0,
               CAST(list_max(embedding) AS DOUBLE) AS emb_max
        FROM embeddings WHERE vec_id <= 10
    """,
)
def q_s19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions on the embedding column."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") <= 10).select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        # try_element_at: ANSI mode raises INVALID_ARRAY_INDEX on an empty
        # array while the oracle's embedding[1] yields NULL — same
        # crash-vs-NULL asymmetry q_s20/q_s22 guard (review r5)
        F.try_element_at("embedding", F.lit(1)).cast("double").alias("emb0"),
        F.array_max("embedding").cast("double").alias("emb_max"),
    )


@query(
    "q_s20_json",
    oracle="""
        SELECT count(*) AS n FROM events
        WHERE CAST(CASE WHEN json_valid(props)
                        THEN json_extract_string(props, '$.k') END
                   AS DOUBLE) > 50
    """,
)
def q_s20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction on the events props column.

    The comparison casts through DOUBLE, not INT: string->INT is an
    engine-divergence trap on non-integral numerics (DuckDB rounds
    '62.5' to 63; Spark's ANSI cast throws CAST_INVALID_INPUT and kills
    the query) — props.k is integral in today's feed, but only the type
    is contractual. The double parse is identical in both engines and
    the predicate itself is exact either way. The oracle guards with
    json_valid(): DuckDB's json_extract_string RAISES on empty/malformed
    props while Spark's get_json_object returns NULL — only the string
    type is contractual, not well-formedness (review r7)."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        F.get_json_object("props", "$.k").cast("double") > 50
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_s21_subquery",
    oracle="""
        SELECT count(*) AS n FROM orders
        WHERE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
              * (SELECT count(*) FROM orders)
            > (SELECT sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) FROM orders)
    """,
)
def q_s21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subqueries (Catalyst decorrelates; the aggregates are
    broadcast). The predicate is ``price > avg(price)`` multiplied through
    to exact integer cents (``cents*n > sum_cents``): a raw DOUBLE avg is
    accumulation-order-sensitive between engines, and a regenerated seed
    can land a price inside the wobble of the threshold — an integer count
    has no rounding canonicalization to absorb that."""
    orders = load_table(spark, sf_dir, "orders")
    # a UNIQUELY named temp view: createOrReplaceTempView("orders") was a
    # session-global catalog mutation that silently repointed any
    # pre-registered 'orders' view (e.g. a different sf_dir) for every
    # later spark.sql consumer (review r5)
    vname = "q_s21_orders_" + uuid.uuid4().hex[:12]
    orders.createOrReplaceTempView(vname)
    try:
        return spark.sql(
            f"""
            SELECT count(*) AS n FROM {vname}
            WHERE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  * (SELECT count(*) FROM {vname})
                > (SELECT sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) FROM {vname})
            """
        )
    finally:
        spark.catalog.dropTempView(vname)


@query(
    "q_s22_udf_parity",
    oracle="""
        SELECT CAST(user_id AS VARCHAR) AS doc_id, count(*) AS n
        FROM events GROUP BY doc_id
    """,
)
def q_s22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Handler-as-UDF parity: the reference's doc-id key extraction
    (integration_test/connector_test.go:628-638) as an Arrow-vectorized
    pandas_udf — the sanctioned slow path; result must equal the pure-SQL
    expression."""
    events = load_table(spark, sf_dir, "events")

    @F.pandas_udf("string")
    def extract_doc_id(user_id: pd.Series) -> pd.Series:
        # null-safe: Arrow hands a NULL-bearing long column over as
        # float64-with-NaN, and astype('int64') raises on NaN — one NULL
        # user_id in a regenerated feed would kill the whole query while
        # the oracle's CAST(NULL AS VARCHAR) just yields a NULL group.
        # Nullable Int64 round-trips NULL -> pandas NA -> SQL NULL.
        out = user_id.astype("Int64").astype("string").astype(object)
        return out.where(out.notna(), None)

    return (
        events.select(extract_doc_id("user_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
