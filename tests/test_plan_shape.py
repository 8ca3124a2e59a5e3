"""Physical-plan assertions: the properties that matter at 100 TB must be
visible in explain() output, not just assumed — column pruning into the scan,
broadcast (never shuffle) rule join, exactly one exchange for the explicit
repartition, and partition-filter pushdown on the bucketed resume read."""

import os

import pytest
from pyspark.sql import functions as F

from ukeeper_readability_spark.data.synth import fixture_transcripts_df
from ukeeper_readability_spark.jobs.extract_job import (
    filter_pending,
    join_rules,
    load_transcripts,
    run_extraction,
)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def transcripts_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plan") / "transcripts")
    fixture_transcripts_df(spark, n_turns=12).write.parquet(p)
    return p


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_is_column_pruned(spark, transcripts_path):
    trans = load_transcripts(spark, transcripts_path)
    out = run_extraction(join_rules(trans, None))
    plan = _plan(out)
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln or "ReadSchema" in ln]
    text = "\n".join(scan) or plan
    # role/ts are never used by extraction → must not reach the scan
    assert "role" not in text, text
    # needed columns must be read
    for col in ("conv_id", "turn_idx", "text", "tool"):
        assert col in text, text


def test_rule_join_is_broadcast_not_shuffle(spark, transcripts_path):
    rules = spark.createDataFrame(
        [("r1", "umputun.com", ".content p", True, False)],
        "id string, domain string, content string, enabled boolean, use_cloudflare boolean",
    )
    trans = load_transcripts(spark, transcripts_path)
    plan = _plan(join_rules(trans, rules))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_single_exchange_for_explicit_repartition(spark, transcripts_path):
    trans = load_transcripts(spark, transcripts_path)
    out = run_extraction(join_rules(trans, None), num_partitions=8)
    plan = _plan(out)
    # one hashpartitioning exchange (the explicit conv_id repartition); the
    # broadcast side contributes BroadcastExchange, not a shuffle
    shuffles = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(shuffles) == 1, plan


def test_resume_filter_prunes_buckets(spark, transcripts_path, tmp_path):
    trans = load_transcripts(spark, transcripts_path)
    pend = filter_pending(trans, [1, 3], nbuckets=4)
    plan = _plan(pend)
    # the bucket predicate must be applied as a filter over xxhash64 — visible
    # in the plan (on an Iceberg table bucket-partitioned by conv_id this
    # becomes partition pruning; parquet keeps it as a post-scan filter)
    assert "xxhash64" in plan and "pmod" in plan


def test_filter_pushdown_reaches_scan(spark, transcripts_path):
    trans = load_transcripts(spark, transcripts_path)
    q = trans.filter(F.col("conv_id") == "conv-00001").select("conv_id", "turn_idx")
    plan = _plan(q)
    assert "PushedFilters" in plan and "conv_id" in plan
    assert "IsNotNull(conv_id)" in plan or "EqualTo(conv_id" in plan, plan
