"""Driver-gate replica: every oracle-backed op must hash-match DuckDB.

Parametrized over the full registry so newly registered ops are
automatically under test (SURVEY.md §5a).
"""

from __future__ import annotations

import pytest

from kinesis_to_firehose_spark.registry import all_ops
from tests.oracle_harness import SF_DIR, compare

OPS = all_ops()
ORACLE_OPS = sorted(name for name, op in OPS.items() if op.sql is not None)
ROWS_ONLY_OPS = sorted(name for name, op in OPS.items() if op.sql is None)


@pytest.mark.parametrize("name", ORACLE_OPS)
def test_oracle_parity(spark, name):
    op = OPS[name]
    compare(op.fn(spark, SF_DIR), op.sql, SF_DIR)


def test_no_rows_only_ops_left():
    """Round-8 invariant: every registered op carries a DuckDB oracle
    (the last holdout, hll_partition_merge, gained a within-bound
    surface). If an op ever registers with sql=None again, this fails
    so the weaker rows-only check is reintroduced deliberately, not
    silently."""
    assert ROWS_ONLY_OPS == []


def test_approx_percentile_error_bounded(spark):
    """Sketch vs exact: approx_percentile must land within a small
    absolute error of the exact per-group percentiles — the raw
    estimates (approx_percentile_raw), independently cross-checked
    against the exact twin op; the registered op's in-plan
    within_bound booleans must all be true (they're the hash-checked
    claim the driver oracle now verifies)."""
    from kinesis_to_firehose_spark.operators.analytics import (
        approx_percentile_raw,
    )
    from kinesis_to_firehose_spark.registry import all_ops

    ops = all_ops()
    sf = "/root/testdata/sf0.01"
    ap = {
        r["event_type"]: (r["p50_approx"], r["p95_approx"])
        for r in approx_percentile_raw(spark, sf).collect()
    }
    ex = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in ops["percentile_by_group"].fn(spark, sf).collect()
    }
    assert set(ap) == set(ex)
    for k in ex:
        assert abs(ap[k][0] - ex[k][0]) < 2.0, k
        assert abs(ap[k][1] - ex[k][1]) < 2.0, k
    for r in ops["approx_percentile_by_group"].fn(spark, sf).collect():
        assert r["p50_within_bound"] and r["p95_within_bound"], r


def test_approx_distinct_error_bounded(spark):
    """Sketch vs exact: per-group HLL++ distinct estimates must land
    within 5x the configured rsd (0.01) of the exact counts — raw
    estimates cross-checked against the exact twin op, plus the
    registered op's in-plan within_bound all true."""
    from kinesis_to_firehose_spark.operators.analytics import (
        approx_distinct_raw,
    )
    from kinesis_to_firehose_spark.registry import all_ops

    ops = all_ops()
    sf = "/root/testdata/sf0.01"
    ap = {
        r["event_type"]: r["n_users_approx"]
        for r in approx_distinct_raw(spark, sf).collect()
    }
    ex = {
        r["event_type"]: r["n_users"]
        for r in ops["distinct_count"].fn(spark, sf).collect()
    }
    assert set(ap) == set(ex)
    for k in ex:
        assert abs(ap[k] - ex[k]) <= max(5, 0.05 * ex[k]), (k, ap[k], ex[k])
    for r in ops["approx_distinct"].fn(spark, sf).collect():
        assert r["within_bound"], r


def test_merge_upsert_equals_full_history_compaction(spark):
    """MERGE of (pre-cutoff snapshot, post-cutoff changeset) must land
    on exactly latest_per_key over the full history — the incremental
    plan and the rescan plan agree row for row."""
    from kinesis_to_firehose_spark.registry import all_ops

    ops = all_ops()
    sf = "/root/testdata/sf0.01"
    merged = {
        r["user_id"]: (r["event_id"], r["ts"], r["event_type"], r["value"])
        for r in ops["merge_upsert"].fn(spark, sf).collect()
    }
    full = {
        r["user_id"]: (r["event_id"], r["ts"], r["event_type"], r["value"])
        for r in ops["latest_per_key"].fn(spark, sf).collect()
    }
    assert merged == full


def test_table_fingerprint_order_independent(spark):
    """The content checksum must be invariant under repartitioning /
    row order — that is the property that lets it verify a migrated
    copy without sorting either side."""
    from kinesis_to_firehose_spark.registry import all_ops

    sf = "/root/testdata/sf0.001"
    op = all_ops()["table_fingerprint"]
    a = {r["tbl"]: (r["n_rows"], r["content_sum"]) for r in op.fn(spark, sf).collect()}
    b = {r["tbl"]: (r["n_rows"], r["content_sum"]) for r in op.fn(spark, sf).collect()}
    assert a == b
    assert set(a) == {"lineitem", "orders"}
    assert all(int(v[1]) > 0 for v in a.values())


def test_bloom_prefilter_selectivity_and_no_false_negatives(spark):
    """The Bloom prefilter must pass EVERY true match (no false
    negatives — the correctness contract) while rejecting most
    non-matching rows (the reason it exists)."""
    from pyspark.sql import functions as F

    from kinesis_to_firehose_spark.functions.bloom import (
        bloom_build,
        bloom_probe,
    )
    from kinesis_to_firehose_spark.operators.analytics import BLOOM_NATION
    from kinesis_to_firehose_spark.sources.tables import load

    sf = "/root/testdata/sf0.01"
    keys = (
        load(spark, "customer", sf)
        .filter(F.col("c_nationkey") == BLOOM_NATION)
        .select("c_custkey")
    )
    words = bloom_build(keys, "c_custkey")
    o = load(spark, "orders", sf)
    total = o.count()
    passed = o.filter(bloom_probe("o_custkey", words))
    true_matches = o.join(
        keys, o["o_custkey"] == keys["c_custkey"], "left_semi"
    )
    n_true = true_matches.count()
    n_passed = passed.count()
    # no false negatives: every true match passes the filter
    assert (
        true_matches.join(
            passed.select("o_orderkey"), "o_orderkey", "left_anti"
        ).count()
        == 0
    )
    # selectivity: the prefilter rejects the bulk of non-matches
    # (1/25 nations ⇒ ~4% true rate; bloom fp adds a small epsilon)
    assert n_true <= n_passed < 0.25 * total, (n_true, n_passed, total)


def _mini_sf(spark, tmp_path, tables):
    """Write a minimal sf-dir with custom tables for NULL-path tests."""
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d, exist_ok=True)
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/{name}.parquet")
    return d


def test_merge_upsert_null_fields_do_not_resurrect_base(spark, tmp_path):
    """A newer change row carrying NULL fields must win WHOLE-ROW: a
    per-column coalesce would resurrect the stale base value into a
    chimera row that never existed."""
    from datetime import datetime

    from kinesis_to_firehose_spark.operators.analytics import merge_upsert

    rows = [
        # base (pre-cutoff): user 1 click value 5.0
        (1, datetime(2024, 1, 10), 1, "click", 5.0, "{}"),
        # change (post-cutoff): NULL event_type and NULL value
        (2, datetime(2024, 2, 10), 1, None, None, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = _mini_sf(spark, tmp_path, {"events": events})
    out = {r["user_id"]: r for r in merge_upsert(spark, sf).collect()}
    r = out[1]
    assert r["action"] == "update"
    assert r["event_id"] == 2
    assert r["event_type"] is None  # NOT the resurrected 'click'
    assert r["value"] is None  # NOT the resurrected 5.0


def test_table_fingerprint_distinguishes_null_patterns(spark, tmp_path):
    """Rows differing only in WHICH column is NULL must hash apart
    (concat_ws silently drops NULL parts and shifts neighbors), and
    NULL-bearing rows must be counted, not skipped."""
    from kinesis_to_firehose_spark.operators.analytics import table_fingerprint

    li_schema = (
        "l_orderkey long, l_linenumber long, l_quantity double, "
        "l_returnflag string"
    )
    o = spark.createDataFrame(
        [(1, "O", 10.0)], "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    a = _mini_sf(
        spark,
        tmp_path / "a",
        {
            "lineitem": spark.createDataFrame([(1, 2, None, "5.0")], li_schema),
            "orders": o,
        },
    )
    b = _mini_sf(
        spark,
        tmp_path / "b",
        {
            "lineitem": spark.createDataFrame([(1, 2, 5.0, None)], li_schema),
            "orders": o,
        },
    )
    fa = {r["tbl"]: r for r in table_fingerprint(spark, a).collect()}
    fb = {r["tbl"]: r for r in table_fingerprint(spark, b).collect()}
    assert fa["lineitem"]["n_rows"] == fb["lineitem"]["n_rows"] == 1
    assert fa["lineitem"]["content_sum"] != fb["lineitem"]["content_sum"]
    assert fa["orders"] == fb["orders"]
