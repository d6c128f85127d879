"""Property checks for the timeseries + split ops beyond hash parity:
grid completeness, fill totality, bin balance, clip fractions, split
proportions (SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_to_firehose_spark.registry import all_ops

SF = "/root/testdata/sf0.01"
OPS = all_ops()


def test_resample_grid_complete_and_filled(spark):
    out = OPS["resample_gapfill"].fn(spark, SF)
    # no hole survives the forward fill (grids start at an observed day)
    assert out.filter(F.col("filled_value").isNull()).count() == 0
    # each user's grid covers exactly first..last day, one row per day
    per_user = out.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("span"),
    )
    assert per_user.filter(F.col("n") != F.col("span")).count() == 0


def test_equidepth_bins_balanced_and_disjoint(spark):
    rows = OPS["equidepth_histogram"].fn(spark, SF).collect()
    assert [r.bin for r in rows] == list(range(1, 11))
    ns = [r.n for r in rows]
    mean = sum(ns) / len(ns)
    for n in ns:  # exact decile edges → near-equal populations
        assert abs(n - mean) / mean < 0.2
    for a, b in zip(rows, rows[1:]):  # contiguous, non-overlapping
        assert a.hi <= b.lo


def test_winsorize_clips_ten_percent(spark):
    rows = OPS["value_winsorize"].fn(spark, SF).collect()
    e = OPS["salted_event_rollup"].fn(spark, SF).collect()
    counts = {r.event_type: r.n_events for r in e}
    for r in rows:
        frac = r.n_clipped / counts[r.event_type]
        assert 0.05 <= frac <= 0.15, (r.event_type, frac)
        assert r.avg_winsorized != r.avg_raw or r.n_clipped == 0


def test_split_proportions(spark):
    rows = OPS["split_train_val_test"].fn(spark, SF).collect()
    d = {r.split: r.n_docs for r in rows}
    n = sum(d.values())
    assert set(d) == {"train", "val", "test"}
    assert 0.85 < d["train"] / n < 0.95
    assert d["val"] / n < 0.10
    assert d["test"] / n < 0.10
