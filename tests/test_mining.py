"""Property tests for the mining/statistics ops (SURVEY.md §5c):
invariants the oracle hash can't express — dominance soundness,
monotonicity, conservation, greedy-trajectory laws."""

from __future__ import annotations

from kinesis_to_firehose_spark.registry import all_ops

SF = "/root/testdata/sf0.01"
OPS = all_ops()


def test_assoc_rules_symmetries(spark):
    rows = OPS["assoc_rules"].fn(spark, SF).collect()
    by_pair = {(r.antecedent, r.consequent): r for r in rows}
    for (a, c), r in by_pair.items():
        rev = by_pair[(c, a)]
        # co-occurrence count and lift are direction-free
        assert r.n_ab == rev.n_ab
        assert abs(r.lift - rev.lift) < 1e-9
        # support = n_ab/total ≤ confidence = n_ab/n_a (n_a ≤ total)
        assert r.support <= r.confidence + 1e-12


def test_weighted_quantile_is_exact(spark):
    import duckdb

    rows = OPS["weighted_quantile"].fn(spark, SF).collect()
    con = duckdb.connect()
    base = con.sql(
        f"""SELECT l_returnflag g, l_extendedprice v, l_quantity w
            FROM read_parquet('{SF}/lineitem.parquet')"""
    ).df()
    for r in rows:
        sub = base[base.g == r.grp]
        tot = sub.w.sum()
        # weight strictly below wq50 < half; through wq50 >= half
        assert sub[sub.v < r.wq50].w.sum() < 0.5 * tot + 1e-6
        assert sub[sub.v <= r.wq50].w.sum() >= 0.5 * tot - 1e-6
        assert sub[sub.v < r.wq90].w.sum() < 0.9 * tot + 1e-6
        assert sub[sub.v <= r.wq90].w.sum() >= 0.9 * tot - 1e-6


def test_weighted_quantile_prefix_sum_matches_bruteforce(spark):
    """r13: the distributed prefix-sum internals (per-(partition, grp)
    running-sum offsets, ROWS-vs-RANGE tie handling, integer-cents
    threshold cross-multiplication) must reproduce the definition
    EXACTLY — min(v | cumw ≥ p·totw) with the RANGE window's
    peers-share-a-cumulative tie semantics — not just land inside a
    mass tolerance band."""
    import duckdb
    import numpy as np

    rows = {r.grp: r for r in OPS["weighted_quantile"].fn(spark, SF).collect()}
    con = duckdb.connect()
    base = con.sql(
        f"""SELECT l_returnflag g, l_extendedprice v, l_quantity w
            FROM read_parquet('{SF}/lineitem.parquet')"""
    ).df()
    assert set(rows) == set(base.g.unique())
    for g, r in rows.items():
        sub = base[base.g == g].sort_values("v", kind="mergesort")
        vc = np.round(sub.v.to_numpy() * 100).astype(np.int64)
        wc = np.round(sub.w.to_numpy() * 100).astype(np.int64)
        cum = np.cumsum(wc)
        tot = int(cum[-1])
        exp50 = vc[np.nonzero(2 * cum >= tot)[0][0]] / 100.0
        exp90 = vc[np.nonzero(10 * cum >= 9 * tot)[0][0]] / 100.0
        assert r.wq50 == exp50, (g, r.wq50, exp50)
        assert r.wq90 == exp90, (g, r.wq90, exp90)
        assert r.total_weight == tot / 100.0


def test_skyline_dominance_sound_and_complete(spark):
    import duckdb

    front = {
        (r.p_partkey, r.p_size, r.price)
        for r in OPS["skyline_pareto"].fn(spark, SF).collect()
    }
    con = duckdb.connect()
    pts = [
        tuple(t)
        for t in con.sql(
            f"""SELECT p_partkey, p_size, CAST(p_retailprice AS DOUBLE)
                FROM read_parquet('{SF}/part.parquet')"""
        ).fetchall()
    ]

    def dominated(p, q):  # q dominates p: strictly larger, no pricier
        return q[1] > p[1] and q[2] <= p[2]

    front_keys = {k for k, _, _ in front}
    for p in pts:
        is_dom = any(dominated(p, q) for q in pts)
        assert (p[0] not in front_keys) == is_dom, p


def test_quantile_normalize_monotone_and_valued(spark):
    rows = OPS["quantile_normalize"].fn(spark, SF).collect()
    global_vals = sorted(r.n_chars for r in rows)
    by_source: dict[str, list] = {}
    for r in rows:
        assert r.norm_chars in set(global_vals)
        by_source.setdefault(r.source, []).append(r)
    for src_rows in by_source.values():
        # normalization preserves within-source order of the raw score
        src_rows.sort(key=lambda r: (r.n_chars, r.doc_id))
        norms = [r.norm_chars for r in src_rows]
        assert norms == sorted(norms)


def test_bootstrap_ci_brackets_point(spark):
    r = OPS["bootstrap_ci"].fn(spark, SF).collect()[0]
    assert r.ci_lo <= r.point_mean <= r.ci_hi
    assert r.n_boot == 32 and r.n_rows > 0


def test_mmr_trajectory_laws(spark):
    rows = OPS["mmr_rerank"].fn(spark, SF).collect()
    brute = OPS["ann_bruteforce_topk"].fn(spark, SF).collect()
    top1 = {r.query_id: r.candidate_id for r in brute if r.rk == 1}
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, sel in by_q.items():
        sel.sort(key=lambda r: r.step)
        # step 1 is pure relevance → must equal brute-force rank 1
        assert sel[0].candidate_id == top1[q]
        # no candidate selected twice
        ids = [r.candidate_id for r in sel]
        assert len(ids) == len(set(ids)) == 5
        # greedy marginal score is non-increasing (pool shrinks,
        # max-sim penalty only grows)
        scores = [r.mmr_score for r in sel]
        assert all(a >= b - 1e-9 for a, b in zip(scores, scores[1:]))


def test_mutual_knn_is_reciprocal_subset(spark):
    knn = OPS["knn_graph"].fn(spark, SF).collect()
    edges = {(r.src, r.neighbor): r.rank for r in knn}
    mutual = OPS["mutual_knn"].fn(spark, SF).collect()
    assert mutual, "planted near-dups must produce mutual pairs"
    for r in mutual:
        assert edges[(r.vec_id_1, r.vec_id_2)] == r.rank_ab
        assert edges[(r.vec_id_2, r.vec_id_1)] == r.rank_ba
    # completeness: every reciprocal knn pair appears
    got = {(r.vec_id_1, r.vec_id_2) for r in mutual}
    for (a, b) in edges:
        if a < b and (b, a) in edges:
            assert (a, b) in got


def test_attribution_conserves_revenue(spark):
    import duckdb

    rows = OPS["attribution_last_touch"].fn(spark, SF).collect()
    total = sum(r.total_value for r in rows)
    n = sum(r.n_purchases for r in rows)
    con = duckdb.connect()
    want_n, want_v = con.sql(
        f"""SELECT COUNT(*), SUM(CAST(value AS DECIMAL(18,6)))
            FROM read_parquet('{SF}/events.parquet')
            WHERE event_type = 'purchase'"""
    ).fetchall()[0]
    assert n == want_n
    assert abs(total - float(want_v)) < 1e-6
    assert {r.channel for r in rows} <= {"click", "view", "unattributed"}


def test_char_entropy_bounds(spark):
    import math

    rows = OPS["char_entropy"].fn(spark, SF).collect()
    hi = math.log2(28)  # 27-char alphabet + other bucket
    assert rows
    for r in rows:
        assert 0.0 <= r.entropy <= hi + 1e-9


def test_source_overlap_jaccard_bounds(spark):
    rows = OPS["source_overlap"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.n_inter <= r.n_union
        assert abs(r.jaccard - round(r.n_inter / r.n_union, 6)) < 1e-9


def test_trend_ols_r2_bounds_and_fit(spark):
    rows = OPS["trend_ols"].fn(spark, SF).collect()
    assert len(rows) == 25  # one per nation
    for r in rows:
        assert 0.0 <= r.r2 <= 1.0 + 1e-9
        assert r.n_months > 2


def test_hll_merge_consistency(spark):
    """Merged daily sketches must equal the direct weekly sketch
    (same algorithm, union is lossless over sketch state), and track
    exact distinct counts within HLL error."""
    from pyspark.sql import functions as F
    from kinesis_to_firehose_spark.sources.tables import load

    from kinesis_to_firehose_spark.operators.mining import (
        HLL_ABS_TOL,
        hll_partition_merge_raw,
    )

    merged = {
        (r.event_type, r.week): r.approx_users
        for r in hll_partition_merge_raw(spark, SF).collect()
    }
    e = load(spark, "events", SF)
    direct = {
        (r.event_type, r.week): (r.direct, r.exact)
        for r in e.groupBy(
            "event_type", F.date_trunc("week", F.col("ts")).alias("week")
        )
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
            .cast("bigint")
            .alias("direct"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for k, approx in merged.items():
        d, exact = direct[k]
        assert approx == d, k  # lossless merge
        assert abs(approx - exact) <= max(HLL_ABS_TOL, 0.05 * exact), k


def test_dp_release_mechanism_properties(spark):
    """DP release: noise stays in the truncated support [-8, 8], the
    released count is the clipped sum, the empirical noise mean sits
    near 0 (symmetric mechanism), and the keyed-PRF noise is
    reproducible run-over-run."""
    sf = "/root/testdata/sf0.01"
    op = all_ops()["dp_noisy_release"]
    rows = op.fn(spark, sf).collect()
    assert len(rows) > 50
    for r in rows:
        assert -8 <= r["noise"] <= 8
        assert r["n_released"] == max(0, r["n_true"] + r["noise"])
    mean_noise = sum(r["noise"] for r in rows) / len(rows)
    # Var of the truncated two-sided geometric ~ 5.8; sem ~ sqrt(5.8/n).
    assert abs(mean_noise) < 1.0
    again = op.fn(spark, sf).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_keyness_terms_are_overrepresented(spark):
    """Every reported keyness term has a strictly higher relative
    frequency inside its source than outside (the ad > bc gate), and
    ranks are dense 1..5 per source."""
    sf = "/root/testdata/sf0.01"
    rows = all_ops()["keyness_terms"].fn(spark, sf).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert len(by_source) >= 2
    # totals per side from the documents table
    from pyspark.sql import functions as F

    from kinesis_to_firehose_spark.operators.dedup import TOK_EXPR
    from kinesis_to_firehose_spark.sources.tables import load

    d = load(spark, "documents", sf)
    tot = {
        r["source"]: r["n"]
        for r in d.select(
            "source", F.size(F.expr(TOK_EXPR)).alias("k")
        )
        .groupBy("source")
        .agg(F.sum("k").alias("n"))
        .collect()
    }
    grand = sum(tot.values())
    for src, rs in by_source.items():
        assert sorted(r["rk"] for r in rs) == list(range(1, len(rs) + 1))
        for r in rs:
            in_rate = r["n_source"] / tot[src]
            out_rate = r["n_rest"] / (grand - tot[src])
            assert in_rate > out_rate, (src, r["term"])


def test_scd2_asof_join_exactly_one_version_per_fact(spark):
    """Every purchase fact matches exactly ONE dimension version (the
    change intervals partition each user's timeline), and the matched
    state is the version open at the fact's timestamp."""
    from pyspark.sql import functions as F

    from kinesis_to_firehose_spark.sources.tables import load

    sf = "/root/testdata/sf0.01"
    res = all_ops()["scd2_asof_join"].fn(spark, sf)
    n_purch = (
        load(spark, "events", sf)
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert res.count() == n_purch
    assert res.select("event_id").distinct().count() == n_purch
    # spot-check interval containment on a sample
    for r in res.limit(50).collect():
        assert r["valid_from"] <= r["ts"]


def test_neyman_allocation_sums_to_budget(spark):
    """Largest-remainder rounding must hit the budget exactly, every
    stratum gets a non-negative allocation, and higher N·σ strata
    never get fewer samples than lower ones (monotone in weight)."""
    from kinesis_to_firehose_spark.operators.mining import NEYMAN_B

    rows = all_ops()["neyman_allocation"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert sum(r["n_alloc"] for r in rows) == NEYMAN_B
    assert all(r["n_alloc"] >= 0 for r in rows)
    by_wgt = sorted(rows, key=lambda r: r["nh"] * r["sigma"])
    allocs = [r["n_alloc"] for r in by_wgt]
    # largest-remainder keeps allocations within 1 of monotone order
    for a, b in zip(allocs, allocs[1:]):
        assert b >= a - 1


def test_ddsketch_relative_error_bounded(spark):
    """DDSketch quantile estimates must land within the configured
    relative accuracy alpha of the exact per-group percentiles (the
    sketch's defining guarantee), and the partition-merge law must
    hold exactly (merged == direct for every group)."""
    from kinesis_to_firehose_spark.operators.mining import (
        DD_ALPHA,
        ddsketch_partition_merge,
        ddsketch_quantiles,
    )
    from kinesis_to_firehose_spark.sources.tables import load
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    est = {
        r["event_type"]: (r["p50_est"], r["p95_est"], r["p99_est"])
        for r in ddsketch_quantiles(spark, sf).collect()
    }
    exact = {
        r["event_type"]: r["qs"]
        for r in load(spark, "events", sf)
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("qs")
        )
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        for got, want in zip(est[k], exact[k]):
            # rank conventions differ slightly between the sketch's
            # ceil(q*n) walk and percentile()'s interpolation; allow
            # alpha relative error plus one bucket width of slack
            assert abs(got - want) <= want * (3 * DD_ALPHA) + 1e-6, (
                k,
                got,
                want,
            )
    merged = ddsketch_partition_merge(spark, sf).collect()
    assert merged and all(r["merged_equals_direct"] == 1 for r in merged)
