"""Driver-facing combo entries folding the relational extension queries.

The driver's CORRECTNESS artifact records at most 50 registry entries, so
the 51 extension queries beyond SURVEY §2 (relational q_s23.., text/LLM
q_l5.., serial-stateful chains) are folded into THREE combo entries
(SX1/SX2/SX3 below). Each sub-query's *full result* is reduced to one
``(part, n_rows, checksum)`` row with a type-canonical, order-independent
value checksum (sql/canon.py) computed identically by Spark and by the
DuckDB oracle — cell-level parity survives the fold, only row identity is
pre-aggregated. The un-folded originals remain oracle-checked row-by-row
in the local suite (tests/test_oracle_suite.py over EXT_REGISTRY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from go_pq_cdc_elasticsearch_spark.sql.registry import EXT_REGISTRY, query

# Grouping/aggregation shapes + join trees: pivot, having, union-all,
# in-subquery, cube, multi-distinct, cross join, null semantics,
# conditional agg, grouping(), TPC-H Q5/Q10 trees, unpivot, range join,
# sessionize, fuzzy join, funnel, transitions. Three combos sized to
# ~1/3 of the folded sequential cost each (r2 verdict item 5: no driver
# entry should dominate the suite; q_sx2 at 26 parts did).
SX1_PARTS = [
    "q_s23_pivot",
    "q_s24_having",
    "q_s25_union_all",
    "q_s26_percentile",
    "q_s27_in_subquery",
    "q_s28_cube",
    "q_s29_multi_distinct",
    "q_s30_cross_join",
    "q_s31_null_handling",
    "q_s32_conditional_agg",
    "q_s37_grouping_id",
    "q_s39_tpch_q5_style",
    "q_s41_unpivot",
    "q_s42_tpch_q10_style",
    "q_s45_range_join",
    "q_s46_sessionize",
    "q_s47_fuzzy_join",
    "q_s49_funnel",
    "q_s50_transitions",
    "q_l16_repetition",
]

# Scalar/type surface + text-pipeline extensions: decimals, window
# analytics, advanced string/array/datetime scalars, correlated agg,
# lateral explode, time_bucket rollup, histogram moments — plus sequence
# packing, stratified sampling, winnowing fingerprints, quality gate,
# mixture sampling, paragraph dedup, LM surprisal, PII redaction, BM25,
# chunking: every SQL-expressible extension gets a driver-hashed signal.
SX2_PARTS = [
    "q_s33_decimal_types",
    "q_s34_window_misc",
    "q_s35_string_advanced",
    "q_s36_array_advanced",
    "q_s38_datetime_advanced",
    "q_s40_correlated_agg",
    "q_s43_lateral_explode",
    "q_s44_time_bucket_rollup",
    "q_s48_histogram_moments",
    "q_l12_pack_sequences",
    "q_l13_hash_sample",
    "q_l14_winnowing",
    "q_l17_quality_gate",
    "q_l18_mixture_sample",
    "q_l19_budget_select",
    "q_l20_paragraph_dedup",
    "q_l22_lm_surprisal",
    "q_l23_pii_redact",
    "q_l24_bm25",
    "q_l25_chunking",
    "q_l21_decontaminate",
    # r11: the Bloom-prefiltered twin of q_l21 — driver-hashed so the
    # sketch path's row-identity-with-exact contract is checked by the
    # driver too, not only locally (single ~4 s job, no serial chain:
    # fits SX2 per the starvation note in SX3_PARTS)
    "q_l27_bloom_decontaminate",
]

# Dedup/similarity family + the continuous aggregate: the former driver
# rows q_l5 (Jaccard verify), q_l6 (embedding near-dup) and q_l7
# (simhash + text features + langid) fold here — demoted to free driver
# slots for q_t4 (watermark) and q_c13 (schema drift); their full results
# stay value-checked through the canonical checksum, and the un-folded
# originals remain row-by-row oracle-checked in the local suite.
SX3_PARTS = [
    "q_l5_jaccard_adjacent",
    "q_l6_embedding_neardup",
    "q_l7_simhash",
    "q_l15_winnow_candidates",
    "q_l26_token_heavy_hitters",
    "q_lx3_quantized_topk",
    # r5: the former rows-only approximate configs, now bounded-claim
    # oracles (exact twin + recall/soundness booleans) — driver-hashed here
    "q_lx1_ann_ivf",
    "q_lx4_semantic_dedup",
    # q_lx5 (2 waves) and q_t8 (3 merges) are serial-stateful chains;
    # measured: they tolerate THIS 8-part fold (~4-8 s) but starve to ~19 s
    # inside the 22-part q_sx2 — keep the serial chains with few neighbors
    "q_lx5_incremental_dedup",
    "q_t8_continuous_agg",
]


def _combo(parts: list[str]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from go_pq_cdc_elasticsearch_spark.sql.canon import spark_canon_summary

        # Evaluate each part's one-row summary as its OWN job and return the
        # collected rows as a local relation. A single lazy N-branch unionAll
        # is pathological here: measured at sf0.01 with 19 branches, 13.7 s
        # of plan construction + 48.6 s execution vs ~12 s for the same parts
        # run separately — Catalyst/codegen cost is superlinear in the merged
        # plan's expression count. Collecting is safe by construction: each
        # part is pre-aggregated to exactly one (part, n_rows, checksum) row,
        # so driver transfer is O(len(parts)), independent of data scale.
        # Parts are independent, so they run as CONCURRENT jobs (Spark's
        # scheduler interleaves them across the executor pool); sequential
        # execution paid ~0.5 s of job overhead per part — 20+ s across the
        # two folds at sf0.1 — where the concurrent wall time is ~the
        # slowest single part.
        import sys
        import time
        from concurrent.futures import ThreadPoolExecutor

        timings: dict[str, float] = {}

        def one(name: str):
            # perf_counter, not time.time(): an NTP step on these noisy
            # hosts would corrupt the per-part attribution this exists for
            t0 = time.perf_counter()
            df = EXT_REGISTRY[name].spark(spark, sf_dir)
            out = spark_canon_summary(df, name).collect()
            timings[name] = round(time.perf_counter() - t0, 2)
            return out

        import os

        # 16 measured best on local[32] (r12 A/B, interleaved 12/16/22
        # reps, minima: 12→7.14 s, 16→6.55 s, 22→6.89 s on the calm
        # session; under induced load 16 beat 12 in 3 of 4 same-window
        # head-to-heads). Re-validated r13 with controlled INTERLEAVED
        # SESSIONS on a calm host (16/12/16/12, warm fold-sum minima:
        # 10.29/10.33/10.57/10.72 s): 16 vs 12 is inside noise with 16
        # never behind — the delta is evidenced-neutral, kept at 16.
        # Env-tunable for other core counts; sized like any concurrent-job
        # fan-out (optimization guide §2.6: enough to fill the tail, not
        # so many that they fight for executors).
        # Plain threads (not pyspark.InheritableThread): under pinned-
        # thread mode they do NOT inherit the caller's job group/job
        # description, so per-query bench attribution and job-group
        # cancellation don't cover the parts' jobs (ADVICE r12 — the same
        # limitation applies to the q_lx4/q_lx1 two-leg pools, which copy
        # this pattern). Accepted: parts set no descriptions of their own,
        # the fold is the timing unit, and InheritableThread would add a
        # py4j round trip per thread start on the hottest driver path.
        n_workers = int(os.environ.get("SPARK_GRAFT_FOLD_WORKERS", "16"))
        try:
            with ThreadPoolExecutor(
                max_workers=min(n_workers, len(parts))
            ) as pool:
                results = list(pool.map(one, parts))
        finally:
            # per-part wall (concurrent, so parts overlap — a part's number
            # is its own latency under contention, not additive): lets a
            # fold regression be attributed to its slowest part instead of
            # re-blaming host weather (VERDICT r4 item 3). Printed from
            # finally so a failing part still surfaces what completed.
            slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
            print(
                "fold parts (slowest 5 of "
                f"{len(timings)}/{len(parts)} completed): "
                + ", ".join(f"{n}={s}s" for n, s in slowest),
                file=sys.stderr,
            )
        rows = [r for rs in results for r in rs]
        return spark.createDataFrame(
            rows, "part string, n_rows long, checksum long"
        )

    return run


def _combo_oracle(parts: list[str]) -> str | None:
    import os

    bootstrap = os.environ.get("SPARK_GRAFT_ORACLE_BOOTSTRAP") == "1"
    try:
        from go_pq_cdc_elasticsearch_spark.sql._ext_oracle_gen import (
            EXT_CANON_ORACLE,
        )
    except ImportError:
        # bootstrap: tools/gen_ext_oracle.py not yet run in a fresh clone
        # (the generator itself imports this module under the env flag)
        return None
    missing = [name for name in parts if name not in EXT_CANON_ORACLE]
    if missing:
        if bootstrap:
            return None
        # a silent None here demoted the WHOLE ~20-part combo from
        # value-checked to rows-only: adding one part without rerunning
        # the generator turned off value verification for every other
        # part too, invisibly (review r7). Fail loudly instead.
        raise RuntimeError(
            f"folded oracle is stale — parts {missing} missing from "
            f"_ext_oracle_gen.py; rerun: python tools/gen_ext_oracle.py"
        )
    return "\nUNION ALL\n".join(EXT_CANON_ORACLE[name] for name in parts)


query(
    "q_sx1_ext_grouping",
    oracle=_combo_oracle(SX1_PARTS),
    doc="Folded extension coverage, grouping/aggregation shapes + join "
    "trees: canonical per-part value checksums, see module docstring.",
)(_combo(SX1_PARTS))

query(
    "q_sx2_ext_analytics",
    oracle=_combo_oracle(SX2_PARTS),
    doc="Folded extension coverage, scalar/type surface + text-pipeline "
    "extensions: canonical per-part value checksums, see module "
    "docstring.",
)(_combo(SX2_PARTS))

query(
    "q_sx3_ext_dedup_sim",
    oracle=_combo_oracle(SX3_PARTS),
    doc="Folded extension coverage, dedup/similarity family incl. the "
    "former q_l5/q_l6/q_l7 driver rows and the continuous aggregate: "
    "canonical per-part value checksums, see module docstring.",
)(_combo(SX3_PARTS))
