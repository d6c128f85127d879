"""Time named ops exactly like bench.py (best-of-N in one session).

Usage: python tools/time_ops.py [--action count|noop] [--reps 3] op1,op2,...
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kinesis_to_firehose_spark.registry import all_ops
from kinesis_to_firehose_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    action = (
        sys.argv[sys.argv.index("--action") + 1]
        if "--action" in sys.argv
        else "count"
    )
    reps = (
        int(sys.argv[sys.argv.index("--reps") + 1])
        if "--reps" in sys.argv
        else 3
    )
    skip = set()
    for flag in ("--action", "--reps"):
        if flag in sys.argv:
            skip.add(sys.argv[sys.argv.index(flag) + 1])
    names = [
        n
        for part in sys.argv[1:]
        if not part.startswith("--") and part not in skip
        for n in part.split(",")
    ]
    spark = get_spark("time-ops")
    ops = all_ops()

    def run(df):
        if action == "count":
            return df.count()
        df.write.format("noop").mode("overwrite").save()
        return None

    # warm the session like bench.py does
    ops["q1_pricing_summary"].fn(spark, SF_DIR).count()
    for name in names:
        spark.sparkContext._jvm.System.gc()
        best, runs, n = None, 0, None
        for _ in range(reps):
            t0 = time.perf_counter()
            n = run(ops[name].fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            runs += 1
        while best < 1.0 and runs < 5:
            t0 = time.perf_counter()
            run(ops[name].fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
            runs += 1
        print(f"{name}: {best:.3f}s rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
