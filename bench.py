"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kinesis_to_firehose_spark.registry import all_ops
from kinesis_to_firehose_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: run every registered op unless listed here (pairwise
# ops that are intentionally quadratic stay out of the headline timing
# once an LSH-prefiltered variant covers the same semantics).
EXCLUDE: set[str] = set()


def main() -> None:
    spark = get_spark("kinesis-to-firehose-spark-bench")
    ops = {k: v for k, v in all_ops().items() if k not in EXCLUDE}
    # Warm the JVM / codegen / parquet footer caches so timings measure
    # the queries, not first-run startup (~35s otherwise).
    for name in ("q1_pricing_summary",):
        if name in ops:
            ops[name].fn(spark, SF_DIR).count()
    timings: dict[str, float] = {}
    total = 0.0
    for name, op in sorted(ops.items()):
        t0 = time.perf_counter()
        df = op.fn(spark, SF_DIR)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
