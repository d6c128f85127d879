"""Per-op timed sweep with a watchdog: run every registry op once at
a given sf dir, cancel any op exceeding the budget via its job group,
and emit one JSON line per op as it finishes — the scale-stress
instrument (a hung op costs `budget` seconds, not the sweep).

Usage: python tools/sweep_ops.py <sf_dir> [budget_sec] [only_prefix]
"""

from __future__ import annotations

import json
import sys
import threading
import time

from kinesis_to_firehose_spark.registry import all_ops
from kinesis_to_firehose_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    prefix = sys.argv[3] if len(sys.argv) > 3 else ""
    spark = get_spark()
    sc = spark.sparkContext
    ops = all_ops()
    for name in sorted(ops):
        if prefix and not name.startswith(prefix):
            continue
        sc.setJobGroup(name, name, interruptOnCancel=True)
        cancelled = threading.Event()

        def cancel(n=name):
            cancelled.set()
            sc.cancelJobGroup(n)

        timer = threading.Timer(budget, cancel)
        timer.start()
        t0 = time.perf_counter()
        try:
            rows = ops[name].fn(spark, sf_dir).count()
            rec = {
                "op": name,
                "sec": round(time.perf_counter() - t0, 3),
                "rows": rows,
            }
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            rec = {
                "op": name,
                "sec": round(time.perf_counter() - t0, 3),
                "rows": None,
                "err": "TIMEOUT" if cancelled.is_set() else str(exc)[:200],
            }
        finally:
            timer.cancel()
            sc.setJobGroup("", "")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
