"""Salted aggregation/join equivalence tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_to_firehose_spark.operators.skew import salted_agg, salted_join
from kinesis_to_firehose_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark):
    e = load(spark, "events", SF)
    plain = {
        (r["event_type"],): (r["n"], r["mx"])
        for r in e.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], r["mx"])
        for r in salted_agg(
            e,
            "event_type",
            {"n": F.count("*"), "mx": F.max("value")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    l = load(spark, "lineitem", SF).select("l_orderkey", "l_quantity")
    o = load(spark, "orders", SF).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = l.join(o, "l_orderkey").count()
    salted = salted_join(l, o, "l_orderkey", n_salts=4).count()
    assert salted == plain
