"""Bench regression diff — compares a BENCH_r{N}.json (or a fresh
`bench.py` output line) against the per-op baseline table in
BASELINE.md and prints one line per op with the ratio, flagging
regressions above THRESHOLD.

Usage:
    python regress.py BENCH_r02.json            # diff a driver bench
    python bench.py | python regress.py -       # diff a fresh run
    python regress.py BENCH.json --update       # also rewrite the
                                                # baseline column in
                                                # BASELINE.md in place
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

BASELINE = Path(__file__).resolve().parent / "BASELINE.md"
THRESHOLD = 1.3  # flag ops slower than 1.3x baseline
ROW_RE = re.compile(r"^\| (\w+) \| ([\d.]+|-) \| ([\d.]+|-) \|$")


def load_baseline() -> dict[str, float]:
    out: dict[str, float] = {}
    for line in BASELINE.read_text().splitlines():
        m = ROW_RE.match(line.strip())
        if m and m.group(2) != "-":
            out[m.group(1)] = float(m.group(2))
    return out


def load_bench(arg: str) -> dict[str, float]:
    text = sys.stdin.read() if arg == "-" else Path(arg).read_text()
    # a bench emits exactly one JSON object line; driver files are pure JSON
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            return d.get("queries", d)
    raise SystemExit("no JSON line found in input")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update" in sys.argv
    if not args:
        raise SystemExit(__doc__)
    bench = load_bench(args[0])
    base = load_baseline()
    regressions = []
    print(f"{'op':34} {'now':>8} {'base':>8} {'ratio':>7}")
    for name in sorted(bench):
        now = bench[name]
        b = base.get(name)
        if b is None:
            print(f"{name:34} {now:8.3f} {'-':>8} {'new':>7}")
            continue
        ratio = now / b if b else float("inf")
        flag = "  <-- REGRESSION" if ratio > THRESHOLD else ""
        print(f"{name:34} {now:8.3f} {b:8.3f} {ratio:6.2f}x{flag}")
        if ratio > THRESHOLD:
            regressions.append((name, now, b, ratio))
    shared = [k for k in bench if k in base]
    total_now = sum(bench[k] for k in shared)
    total_base = sum(base[k] for k in shared)
    print(
        f"\ntotal {sum(bench.values()):.2f}s over {len(bench)} ops; "
        f"shared {len(shared)} ops {total_now:.2f}s vs baseline {total_base:.2f}s"
    )
    if update:
        lines = BASELINE.read_text().splitlines(keepends=True)
        seen = set()
        last_row = max(
            (i for i, ln in enumerate(lines) if ROW_RE.match(ln.strip())),
            default=None,
        )
        if last_row is None:
            raise SystemExit("no per-op table found in BASELINE.md")
        for i, ln in enumerate(lines):
            m = ROW_RE.match(ln.strip())
            if m and m.group(1) in bench:
                seen.add(m.group(1))
                lines[i] = (
                    f"| {m.group(1)} | {round(bench[m.group(1)], 3)} "
                    f"| {m.group(3)} |\n"
                )
        new_rows = [
            f"| {name} | {round(bench[name], 3)} | - |\n"
            for name in sorted(bench)
            if name not in seen
        ]
        lines[last_row + 1 : last_row + 1] = new_rows
        BASELINE.write_text("".join(lines))
        print(f"BASELINE.md updated ({len(seen)} rows, {len(new_rows)} new)")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
