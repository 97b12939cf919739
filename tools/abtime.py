"""Interleaved A/B timing for the scan fan-out conf (one session).

Builds each query's frame twice — fan-out enabled then disabled (the
``spark.wod_etl.scan_fanout`` conf is read at frame-build time) — and
interleaves noop-sink executions ON/OFF/ON/OFF, reporting min-of-N per
arm. Interleaving cancels box drift and codegen-cache effects that make
separate-process comparisons lie (r17 protocol).

Usage: python tools/abtime.py q_foo q_bar [--runs 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=7)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from weightlifting_wod_etl_spark.queries_registry import QUERIES
    from weightlifting_wod_etl_spark.session import get_spark

    spark = get_spark(
        app_name="wod-etl-abtime",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in args.queries:
        spark.conf.set("spark.wod_etl.scan_fanout", "true")
        df_on = QUERIES[name](spark, sf_dir)
        spark.conf.set("spark.wod_etl.scan_fanout", "false")
        df_off = QUERIES[name](spark, sf_dir)
        spark.conf.unset("spark.wod_etl.scan_fanout")
        on, off = [], []
        # one untimed warm execution per arm (codegen + footer cache)
        for df in (df_on, df_off):
            df.write.format("noop").mode("overwrite").save()
        for _ in range(args.runs):
            for df, acc in ((df_on, on), (df_off, off)):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                acc.append(time.perf_counter() - t0)
        print(
            f"{name}: fanout_on min={min(on):.3f}s off min={min(off):.3f}s "
            f"ratio(on/off)={min(on) / min(off):.2f}  "
            f"on={[round(s, 3) for s in on]} off={[round(s, 3) for s in off]}"
        )


if __name__ == "__main__":
    main()
