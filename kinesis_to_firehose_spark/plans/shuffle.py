"""Shuffle-partition sizing advisor (SURVEY §6 / round-6 candidate 4).

`spark.sql.shuffle.partitions` is the one knob that cannot be left at
its default at 100 TB: too few partitions spill, too many drown the
scheduler. The right number is shuffled-bytes / target-partition-size,
and shuffled bytes are predictable per op family:

- narrow maps (decode, text metrics, extraction): fraction 0 — no
  shuffle at all, the setting is irrelevant.
- one-shuffle aggregates (q1, rollups, histograms): the map-side
  combine collapses to the AGGREGATED key space — typically ≤1% of
  input bytes.
- fact-fact joins (q3/q10/q18 shapes): both sides move — fraction ≈ 1
  of the post-filter input.
- token explodes with partial agg (vocab, tf-idf, unigram): the
  explode multiplies rows ~tokens-per-doc but the partial agg
  collapses back to vocabulary size before the network — fraction
  well under 0.1 of the EXPLODED bytes.
- dedup/LSH signature joins: only signatures/band keys move — ~2% of
  raw bytes (measured, SURVEY §6).

`advise_shuffle_partitions` turns (input_bytes, fraction) into a
partition count clamped to sane bounds. Undersizing is the dangerous
direction; AQE's coalescer (enabled in session.py) cheaply REDUCES
over-provisioned partitions at runtime — tests assert that behavior —
but cannot split an undersized one except via the skew handler, so
round up.
"""

from __future__ import annotations

import math
import os

TARGET_SHUFFLE_PARTITION_BYTES = 200 * 1024 * 1024  # SURVEY §6 sizing

# measured shuffle fractions per family (see module docstring)
FAMILY_SHUFFLE_FRACTION = {
    "narrow": 0.0,
    "agg": 0.01,
    "join": 1.0,
    "explode_agg": 0.1,
    "lsh": 0.02,
}


def advise_shuffle_partitions(
    input_bytes: int,
    family: str = "join",
    target_bytes: int = TARGET_SHUFFLE_PARTITION_BYTES,
    min_partitions: int = 1,
    max_partitions: int = 1_000_000,
) -> int:
    """Partition count so each shuffle partition lands ≈ target_bytes.
    `family` picks the measured shuffled-bytes fraction; pass a float
    via `FAMILY_SHUFFLE_FRACTION`-style override by prescaling
    input_bytes if a custom pipeline needs it."""
    if family not in FAMILY_SHUFFLE_FRACTION:
        raise KeyError(
            f"unknown family {family!r}; one of {sorted(FAMILY_SHUFFLE_FRACTION)}"
        )
    shuffled = input_bytes * FAMILY_SHUFFLE_FRACTION[family]
    return max(min_partitions, min(max_partitions, math.ceil(shuffled / target_bytes)))


def table_bytes(sf_dir: str, tables: tuple[str, ...]) -> int:
    """On-disk bytes of the named testdata tables (the advisor's
    input-size estimate; at cluster scale this comes from the catalog
    or file listing the same way)."""
    total = 0
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isfile(p):
            total += os.path.getsize(p)
        elif os.path.isdir(p):
            total += sum(
                os.path.getsize(os.path.join(p, f))
                for f in os.listdir(p)
                if not f.startswith(("_", "."))
            )
    return total


def advise_for_tables(
    sf_dir: str, tables: tuple[str, ...], family: str = "join"
) -> int:
    return advise_shuffle_partitions(table_bytes(sf_dir, tables), family)
