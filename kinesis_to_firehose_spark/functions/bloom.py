"""Portable Bloom-filter prefilter for selective fact-dim joins.

At 100 TB, "orders of the customers matching a selective dim filter"
pays a full shuffle of orders into the semi-join — unless the tiny
key set rides into the fact SCAN as a filter. A Bloom filter is that
vehicle: built from the filtered dim keys (a sketch, ≪ data),
inlined as literal words into a boolean expression the scan
evaluates row-by-row with integer ops (whole-stage codegen, no
Python). False positives are removed by the exact join that follows,
so results are bit-identical to the plain join — the bloom only cuts
the rows entering the shuffle. Spark's AQE injects a similar runtime
filter for some plans; this makes the pattern explicit, portable,
and usable where AQE declines.

Hashes are md5-prefix based (engine-portable, deterministic) rather
than xxhash64, so tests and oracles can restate membership exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 8192  # 1 KiB of filter → fp rate ~0.5% at ~600 keys, k=5
K_HASHES = 5


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions per key: 60-bit md5 prefixes of (key, seed)."""
    out = []
    for j in range(k):
        h = F.conv(
            F.substring(F.md5(F.concat_ws("|", key.cast("string"), F.lit(j))), 1, 15),
            16,
            10,
        ).cast("long")
        out.append(F.pmod(h, F.lit(m_bits)))
    return out


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = M_BITS, k: int = K_HASHES
) -> list[int]:
    """Aggregate the key set into m_bits/64 filter words (bit_or of
    per-key bit masks — map-side combined, one tiny shuffle) and
    collect them: the sketch is the ONLY thing that reaches the
    driver."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            # SQL form: the python shiftleft wrapper only takes a
            # literal shift count
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[r["w"]] = r["word"]
    return arr


def bloom_probe(
    key_sql: str, words: list[int], m_bits: int = M_BITS, k: int = K_HASHES
) -> Column:
    """Boolean membership test as a pure SQL expression over the
    literal filter words — evaluated inside the scan stage, no join,
    no shuffle. Structured as forall(transform(seeds, j -> pos_j),
    p -> bit_set(p)) so each md5 position is computed ONCE (naive
    textual duplication would evaluate it twice per check and repeat
    the word-array literal k times). SQL form throughout because the
    bit-shift amount is itself an expression, which the python
    shiftleft/shiftright wrappers don't accept."""
    arr = "array(" + ", ".join(f"CAST({w} AS BIGINT)" for w in words) + ")"
    pos = (
        f"pmod(CAST(conv(substring(md5(concat_ws('|', "
        f"CAST({key_sql} AS STRING), CAST(j AS STRING))), 1, 15), 16, 10) "
        f"AS BIGINT), {m_bits})"
    )
    return F.expr(
        f"forall(transform(sequence(0, {k - 1}), j -> {pos}), "
        f"p -> (shiftright(element_at({arr}, CAST(p / 64 AS INT) + 1), "
        f"CAST(p % 64 AS INT)) & 1) = 1)"
    )
