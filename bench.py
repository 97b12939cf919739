"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver materialization) so timings measure the distributed plan, not
collect serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

HEADLINE = [
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_sessionize_events",
    "q_group_concat",
    "q_pivot_wide",
    "q_weekly_rollup",
    "q_dedup_exact",
    "q_window_rank",
    "q_wod_pipeline",
    "q_date_extract",
    "q_minhash_lsh",
    "q_simhash",
    "q_embed_neardup",
    "q_skew_agg",
    "q_asof_join",
    "q_range_join",
    "q_ann_ivf",
    "q_tpch_q18",
    "q_rolling_hash",
    "q_percentile",
    "q_semi_join",
    "q_outer_join_dist",
    "q_count_distinct",
    "q_window_frames",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from weightlifting_wod_etl_spark.queries_registry import QUERIES
    from weightlifting_wod_etl_spark.session import get_spark

    spark = get_spark(app_name="wod-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup, uncounted

    # min-of-N: first run pays codegen/footer warmup; min over the rest is
    # the engine's steady-state throughput and is robust to box noise.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        df = QUERIES[name](spark, sf_dir)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
