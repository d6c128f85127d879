"""Local replica of the driver's t2 correctness gate.

For every registered op with an oracle: run the Spark query and the
DuckDB SQL on the same sf dir, then compare row count, column names,
and order-insensitive values (columns sorted by name, rows sorted,
floats compared exactly after both sides' in-query rounding).
"""

from __future__ import annotations

import math
import os

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sql: str, sf_dir: str = SF_DIR):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    # Optional watchdog for scale-stress sweeps (regress.py --parity
    # --budget): interrupt a runaway oracle instead of hanging the
    # whole sweep. 0/unset = no limit (the pytest gate's default).
    budget = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "0") or 0)
    if budget > 0:
        import threading

        timer = threading.Timer(budget, con.interrupt)
        timer.start()
        try:
            return con.sql(sql).df()
        finally:
            timer.cancel()
    return con.sql(sql).df()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # BIT-EXACT float compare (strictly harder than any plausible
        # driver hash). Verified achievable: identical fold orders and
        # ROUND implementations across engines on this data.
        import struct

        return struct.pack(">d", v).hex()
    return str(v)


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str = SF_DIR) -> None:
    got = spark_df.toPandas()
    want = duckdb_run(oracle_sql, sf_dir)
    gcols, grows = _canon(got)
    wcols, wrows = _canon(want)
    assert gcols == wcols, f"column mismatch: spark={gcols} oracle={wcols}"
    assert len(grows) == len(wrows), f"row count: spark={len(grows)} oracle={len(wrows)}"
    mismatches = [(a, b) for a, b in zip(grows, wrows) if a != b]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[:3]}"
