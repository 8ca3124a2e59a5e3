"""Gap-based sessionization over an event stream table.

Batch sessionization (window functions) — the Structured-Streaming analogue
would be applyInPandasWithState, but this engine is deliberately batch-only
(SURVEY §7: the north rule is batch with manifest-based resume). One shuffle on
user_id; per-user state is a running sum over an ordered window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Split each user's events into sessions at inactivity gaps.

    Returns (user_id, session_seq, n_events, first_ts, last_ts, total_value);
    deterministic ordering ties broken by `order_tiebreak`.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # TIMESTAMP_NTZ needs a tz-typed hop before epoch; any consistent offset
    # cancels out in the gap differences
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, 0
    )
    with_sessions = events.withColumn("_new", new_session).withColumn(
        "session_seq", F.sum("_new").over(run)
    )
    ep = F.col(ts_col).cast("timestamp").cast("long")
    return (
        with_sessions.withColumn("_ep", ep)
        .groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_ep").alias("first_ts_epoch"),
            F.max("_ep").alias("last_ts_epoch"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
    )
