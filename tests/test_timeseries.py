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


def test_scd2_history_invariants(spark):
    """Per user: versions are contiguous from 1, exactly one open row
    (is_current), intervals chain exactly (valid_to == next
    valid_from), and consecutive versions always change event_type."""
    from kinesis_to_firehose_spark.operators.analytics import scd2_history

    rows = scd2_history(spark, SF).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
        assert sum(r["is_current"] for r in vs) == 1
        assert vs[-1]["is_current"] == 1 and vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"]


def test_inverted_index_blocks_bounded_and_sorted(spark):
    """Posting blocks never exceed POSTING_BLOCK, postings are strictly
    increasing within a block, blocks partition the distinct-doc set,
    and block boundaries respect doc_id order across blocks."""
    from kinesis_to_firehose_spark.operators.curation import (
        POSTING_BLOCK,
        build_inverted_index,
    )

    rows = build_inverted_index(spark, SF).collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    assert by_term
    for term, blocks in by_term.items():
        blocks.sort(key=lambda r: r["block_id"])
        assert [b["block_id"] for b in blocks] == list(range(len(blocks)))
        all_docs = []
        for b in blocks:
            assert 1 <= len(b["postings"]) <= POSTING_BLOCK
            assert b["block_df"] == len(b["postings"])
            assert b["postings"] == sorted(b["postings"])
            all_docs.extend(b["postings"])
        # full list strictly increasing across block boundaries too
        assert all_docs == sorted(set(all_docs))
        # only the last block may be partial
        for b in blocks[:-1]:
            assert len(b["postings"]) == POSTING_BLOCK
