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


# ---------------------------------------------------------------------
# Join-strategy advisor (round-9 candidate 4): one profiling pass per
# side — input bytes from the scan's file list, distinct join keys and
# the hot-key share from a single groupBy-count aggregate (at 100 TB
# swap that pass for approx_count_distinct + a sampled top-k; the
# decision logic is unchanged) — turned into the broadcast / shuffle /
# bucket / salt decision a planner (or a reviewer) makes by hand
# today. The
# point is to DECIDE BEFORE SHUFFLING: a wrong broadcast is an
# executor OOM, a missed broadcast is a full co-shuffle, and an
# unsalted hot key turns one reducer into the job's critical path.
# ---------------------------------------------------------------------
DEFAULT_BROADCAST_BYTES = 10 * 1024 * 1024  # Spark's default threshold
SKEW_SHARE_THRESHOLD = 0.2  # top key holding >20% of rows ⇒ salt


def _input_bytes(df) -> int | None:
    files = df.inputFiles()
    if not files:
        return None
    total = 0
    for f in files:
        p = f.removeprefix("file:")
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return total


def join_side_profile(df, key: str) -> dict:
    """One aggregate pass: rows, distinct keys, top-key share."""
    from pyspark.sql import functions as F

    counts = df.groupBy(key).count()
    row = counts.agg(
        F.sum("count").alias("rows"),
        F.count("*").alias("n_keys"),
        F.max("count").alias("top_key_rows"),
    ).first()
    rows = int(row["rows"] or 0)
    return {
        "bytes": _input_bytes(df),
        "rows": rows,
        "n_keys": int(row["n_keys"] or 0),
        "top_key_share": (
            (int(row["top_key_rows"]) / rows) if rows else 0.0
        ),
    }


def advise_join(
    left, right, key: str,
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES,
) -> dict:
    """Recommend a strategy for `left ⋈ right ON key`:

    - `broadcast_left` / `broadcast_right` when a side's scan bytes
      fit the broadcast budget (ship the small side, shuffle nothing),
    - else `shuffle` (co-partitioned sort-merge/hash under AQE), with
      `bucket_candidate=True` when both sides are large — the signal
      this join should be amortized into bucketed writes if it recurs,
    - `salt=True` when either side's hottest key exceeds the skew
      share threshold (pair with operators/skew.py; AQE's skew
      handler splits partitions, but only salting splits ONE key's
      reducer).
    """
    lp = join_side_profile(left, key)
    rp = join_side_profile(right, key)
    lb, rb = lp["bytes"], rp["bytes"]
    if rb is not None and rb <= broadcast_bytes and (
        lb is None or rb <= lb
    ):
        strategy = "broadcast_right"
    elif lb is not None and lb <= broadcast_bytes:
        strategy = "broadcast_left"
    else:
        strategy = "shuffle"
    return {
        "strategy": strategy,
        "bucket_candidate": strategy == "shuffle",
        "salt": max(lp["top_key_share"], rp["top_key_share"])
        > SKEW_SHARE_THRESHOLD,
        "left": lp,
        "right": rp,
    }
