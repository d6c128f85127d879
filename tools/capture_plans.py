"""Dump `.explain("formatted")` for named ops into plans/<tag>/.

Usage:
    python tools/capture_plans.py --tag r12 --suffix before op1,op2,...

Writes plans/<tag>/<op>_<suffix>.txt for each named op — the judge
checks plan-shape claims in OPTIMIZATION_*.md against these files.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kinesis_to_firehose_spark.plans.explain import formatted_plan
from kinesis_to_firehose_spark.registry import all_ops
from kinesis_to_firehose_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    # argparse (ADVICE r12): flag values used to be skipped from the
    # positional op list by string EQUALITY, so an op group literally
    # named like the --tag/--suffix value was silently dropped.
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("ops", nargs="+", help="op names (comma-separable)")
    args = ap.parse_args()
    names = [n for part in args.ops for n in part.split(",") if n]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("capture-plans")
    ops = all_ops()
    for name in names:
        df = ops[name].fn(spark, SF_DIR)
        (out_dir / f"{name}_{args.suffix}.txt").write_text(formatted_plan(df))
        print(f"wrote plans/{args.tag}/{name}_{args.suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
