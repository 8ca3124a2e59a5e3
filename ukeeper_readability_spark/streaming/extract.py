"""Streaming extraction ingest: readStream → rule join → Arrow UDF → sink.

The batch job (jobs/extract_job.py) resumes via a per-bucket manifest and an
anti-join (S11). Structured Streaming's file source + checkpoint is the
streaming-native equivalent: the checkpoint's file log records which input
files each micro-batch consumed, so a restarted query processes exactly the
files that arrived since — no reprocessing, no manifest code. The
transformation chain is the SAME code as batch (join_rules +
run_extraction): a broadcast join against the static rules dimension and the
Arrow-batched mapInPandas extraction are both stateless, so they run
unchanged under a streaming plan.

Production shape (10^12 turns): the parquet/Iceberg landing zone is the
stream source, `trigger(processingTime=...)` paces micro-batches, the sink
is an Iceberg table (`.toTable(...)`), and `maxFilesPerTrigger` bounds
per-batch work; tests and the sandbox use availableNow (drain everything,
then stop) over local parquet dirs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..jobs.extract_job import (
    DEFAULT_SNIPPET_SIZE,
    TRANSCRIPTS_SCHEMA,
    join_rules,
    run_extraction,
)


def run_extraction_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    rules: Optional[DataFrame] = None,
    snippet_size: int = DEFAULT_SNIPPET_SIZE,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Start the streaming extraction query; returns the StreamingQuery.

    Callers drain a bounded corpus with the default availableNow trigger
    (`q.awaitTermination()`); a long-running ingest passes
    available_now=False and its own trigger/pacing via the returned query's
    management API. Restarting with the same checkpoint_path resumes from
    the last committed micro-batch — the file source replays nothing.
    """
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    out = run_extraction(
        join_rules(stream, rules), snippet_size=snippet_size,
        num_partitions=None,
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
