"""Dump `.explain("formatted")` for named ops into plans/<tag>/.

Usage:
    python tools/capture_plans.py --tag r12 --suffix before op1,op2,...

Writes plans/<tag>/<op>_<suffix>.txt for each named op — the judge
checks plan-shape claims in OPTIMIZATION_*.md against these files.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kinesis_to_firehose_spark.plans.explain import formatted_plan
from kinesis_to_firehose_spark.registry import all_ops
from kinesis_to_firehose_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[sys.argv.index("--tag") + 1] if "--tag" in sys.argv else "r12"
    suffix = (
        sys.argv[sys.argv.index("--suffix") + 1]
        if "--suffix" in sys.argv
        else "before"
    )
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    # skip flag values
    skip = set()
    for flag in ("--tag", "--suffix"):
        if flag in sys.argv:
            skip.add(sys.argv[sys.argv.index(flag) + 1])
    names = [n for part in names if part not in skip for n in part.split(",")]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("capture-plans")
    ops = all_ops()
    for name in names:
        df = ops[name].fn(spark, SF_DIR)
        (out_dir / f"{name}_{suffix}.txt").write_text(formatted_plan(df))
        print(f"wrote plans/{tag}/{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
