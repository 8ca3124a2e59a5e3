"""Gap-based sessionization over an event stream table.

Batch sessionization (window functions) — the Structured-Streaming analogue
would be applyInPandasWithState, but this engine is deliberately batch-only
(SURVEY §7: the north rule is batch with manifest-based resume). One shuffle on
user_id; per-user state is a running sum over an ordered window.

At 10^12-event scale even that one shuffle should come from the TABLE LAYOUT,
not runtime: store events bucketed by user_id (ensure_events_bucketed below)
and the window + agg run with ZERO Exchange operators — the bucketed scan's
HashPartitioning(user_id) satisfies both the window's and the groupBy's
required distribution, leaving only per-partition local sorts.
"""

from __future__ import annotations

import json
import os
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: marker written next to the bucketed files; leading "_" keeps it out of
#: Spark's data-file listing (same convention as _SUCCESS)
_BUCKET_SPEC_FILE = "_bucket_spec.json"

#: below this average per-bucket row count the bucketed layout's per-file
#: overhead outweighs the shuffle it avoids (measured in BENCH.md: at 100k
#: events / 64 buckets the bucketed read is SLOWER than the 240 KB shuffle)
MIN_AVG_ROWS_PER_BUCKET = 4096


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


def ensure_events_bucketed(
    spark: SparkSession,
    events: DataFrame,
    path: str,
    table: str = "events_bucketed",
    nbuckets: int = 64,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Materialize (once) and register `events` as a user_id-bucketed table.

    This is the 100 TB layout for sessionize: the bucketed scan reports
    HashPartitioning(user_col), so the window partitionBy and the session
    groupBy both run WITHOUT an Exchange (plan-asserted in
    tests/test_plan_shape.py). Files written by a previous session are
    re-registered via external-table DDL — bucket metadata lives in the
    catalog, the bucket id lives in the file names Spark wrote. The first
    write drops a `_bucket_spec.json` marker (nbuckets, bucket/sort columns)
    next to the files; re-registration VERIFIES the marker and raises on a
    mismatch or an interrupted/foreign write — registering DDL the files
    don't satisfy would make the exchange-free sessionize silently wrong.

    Corpus sizing: bucketing pays off when buckets hold at least a few
    thousand rows each (MIN_AVG_ROWS_PER_BUCKET); below that the per-file
    open/footer overhead of nbuckets near-empty parquet files costs more
    than the small shuffle it avoids (BENCH.md measures the crossover). A
    warning fires in that regime — shrink nbuckets or keep the plain
    layout. At the 10^12-row target, size nbuckets so each bucket is a few
    hundred MB of parquet.

    Iceberg equivalent (env has no Iceberg runtime jar, CLAUDE.md):
        CREATE TABLE events (...) USING iceberg
        PARTITIONED BY (bucket(64, user_id))
    with spark.sql.iceberg.planning.preserve-data-grouping=true for
    storage-partitioned (exchange-free) reads.
    """
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in events.schema.fields
    )
    spec = {
        "nbuckets": nbuckets,
        "bucket_col": user_col,
        "sort_cols": [user_col, ts_col, order_tiebreak],
    }
    marker = os.path.join(path, _BUCKET_SPEC_FILE)
    have_files = os.path.isdir(path) and any(
        fn.startswith("part-") for fn in os.listdir(path)
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if not have_files:
        (
            events.write.mode("overwrite")
            .bucketBy(nbuckets, user_col)
            .sortBy(user_col, ts_col, order_tiebreak)
            .option("path", path)
            .saveAsTable(table)
        )
        # marker LAST: an interrupted write leaves part- files with no
        # marker, which the re-registration branch refuses below
        with open(marker, "w") as f:
            json.dump(spec, f)
    else:
        if not os.path.isfile(marker):
            raise ValueError(
                f"{path} has data files but no {_BUCKET_SPEC_FILE} marker "
                "(interrupted or foreign write?) — refusing to register a "
                "bucket layout the files may not have; delete the directory "
                "and rewrite"
            )
        with open(marker) as f:
            existing = json.load(f)
        if existing != spec:
            raise ValueError(
                f"bucket layout mismatch at {path}: files were written with "
                f"{existing}, caller asked for {spec} — registering the "
                "requested DDL would silently corrupt exchange-free "
                "sessionize results; delete the directory to rewrite"
            )
        spark.sql(
            f"""
            CREATE TABLE {table} ({ddl}) USING PARQUET
            CLUSTERED BY ({user_col})
            SORTED BY ({user_col}, {ts_col}, {order_tiebreak})
            INTO {nbuckets} BUCKETS
            LOCATION '{path}'
            """
        )
    out = spark.table(table)
    # Sizing check from parquet FOOTER row counts (ADVICE r5): Spark has no
    # metadata-only count for parquet through this v1 table path — out.count()
    # was a zero-column scan job that listed and opened every bucket file on
    # EVERY re-registration, an O(files) cost at the 10^12-row target. The
    # footers already hold num_rows; sum them directly (local/posix paths —
    # on an object store, persist the row count in the _bucket_spec marker
    # at write time instead).
    import pyarrow.parquet as _pq

    n = 0
    for fn in os.listdir(path):
        if fn.startswith("part-") and fn.endswith(".parquet"):
            n += _pq.ParquetFile(os.path.join(path, fn)).metadata.num_rows
    if n and n / nbuckets < MIN_AVG_ROWS_PER_BUCKET:
        warnings.warn(
            f"events_bucketed: {n} rows across {nbuckets} buckets averages "
            f"{n // nbuckets} rows/bucket (< {MIN_AVG_ROWS_PER_BUCKET}); at "
            "this size the bucketed read's per-file overhead exceeds the "
            "shuffle it avoids (see BENCH.md) — shrink nbuckets or keep the "
            "plain layout",
            stacklevel=2,
        )
    return out
