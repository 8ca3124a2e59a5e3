"""Benchmark harness (driver contract).

Runs the headline extraction queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
plus throughput extras (turns/sec per query) used by BENCH.md and the
two-parallelism scaling evidence (tools/scaling_bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from ukeeper_readability_spark.data.synth import (
    BOILERPLATE_WRAP_SQL,
    fixture_transcripts_df,
    transcripts_from_documents_sql,
)
from ukeeper_readability_spark.jobs.extract_job import (
    get_spark,
    join_rules,
    run_extraction,
)

# bench variant without the oracle-purity guard: every document row qualifies
_BENCH_TRANSCRIPTS_SQL = """
    SELECT 'conv-' || (doc_id % 50) AS conv_id,
           CAST(floor(doc_id / 50.0) AS INT) * {copies} + copy_n AS turn_idx,
           'tool' AS role,
           {wrap} AS text,
           'http://' || source || '.example.com/docs/' || doc_id AS tool
    FROM documents
    CROSS JOIN (SELECT explode(sequence(0, {copies} - 1)) AS copy_n)
"""


def _force(df) -> int:
    """Materialize the full computation; returns row count."""
    row = df.select(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("content")).alias("b")
    ).collect()[0]
    return row.n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    copies = int(os.environ.get("SPARK_GRAFT_BENCH_COPIES", "4"))
    fixture_turns = int(os.environ.get("SPARK_GRAFT_BENCH_FIXTURE_TURNS", "600"))

    spark = get_spark(
        app_name=f"bench-local-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")

    queries = {}
    rates = {}

    # q1: boilerplate-strip extraction over the documents corpus (small docs)
    trans = spark.sql(
        _BENCH_TRANSCRIPTS_SQL.format(wrap=BOILERPLATE_WRAP_SQL, copies=copies)
    )
    joined = join_rules(trans, None)
    out = run_extraction(joined, num_partitions=cpus * 2)
    t0 = time.perf_counter()
    n1 = _force(out)
    dt1 = time.perf_counter() - t0
    queries["extract_documents_boilerplate"] = round(dt1, 3)
    rates["extract_documents_boilerplate"] = round(n1 / dt1, 1)

    # q2: golden-fixture corpus (12-17 KB real article HTML — the heavy path)
    ftrans = fixture_transcripts_df(spark, n_turns=fixture_turns)
    fjoined = join_rules(ftrans, None)
    fout = run_extraction(fjoined, num_partitions=cpus * 2)
    t0 = time.perf_counter()
    n2 = _force(fout)
    dt2 = time.perf_counter() - t0
    queries["extract_fixture_articles"] = round(dt2, 3)
    rates["extract_fixture_articles"] = round(n2 / dt2, 1)

    total = dt1 + dt2
    result = {
        "metric": "extraction wall-clock (sum of headline queries)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "turns": {"extract_documents_boilerplate": n1, "extract_fixture_articles": n2},
        "turns_per_sec": rates,
        "cpus": cpus,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
