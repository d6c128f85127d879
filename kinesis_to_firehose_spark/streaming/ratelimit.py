"""Stateful per-shard rate accounting (reference READ_RATE_LIMIT,
main.go:52 `ReadRateLimit`) as a custom Structured Streaming operator.

The KCL consumer throttles reads per shard; in Spark the equivalent
control point is a stateful operator that tracks per-shard consumption
across micro-batches and tags (or defers) records beyond the limit.
Implemented with applyInPandasWithState — Arrow-batched, one state row
per shard, the idiomatic Spark shape for custom streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("batch_records", T.LongType()),
        T.StructField("total_records", T.LongType()),
        T.StructField("over_limit", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])


def rate_limited_counts(
    events: DataFrame, records_per_trigger: int
) -> DataFrame:
    """Per-shard stateful accounting: cumulative record totals across
    micro-batches and the count exceeding the per-trigger budget."""

    def _account(key, pdfs, state: GroupState):
        import pandas as pd

        n = 0
        for pdf in pdfs:
            n += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += n
        state.update((total,))
        over = max(0, n - records_per_trigger)
        yield pd.DataFrame(
            {
                "shard": [key[0]],
                "batch_records": [n],
                "total_records": [total],
                "over_limit": [over],
            }
        )

    return (
        events.groupBy(F.col("user_id"))
        .applyInPandasWithState(
            _account,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
