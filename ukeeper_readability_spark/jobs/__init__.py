from .extract_job import (
    enabled_rules_first_match,
    filter_pending,
    get_spark,
    join_rules,
    load_rules,
    load_transcripts,
    partition_metrics,
    pending_buckets,
    run_extraction,
    run_pipeline,
    with_host,
    write_with_manifest,
)

__all__ = [
    "enabled_rules_first_match",
    "filter_pending",
    "get_spark",
    "join_rules",
    "load_rules",
    "load_transcripts",
    "partition_metrics",
    "pending_buckets",
    "run_extraction",
    "run_pipeline",
    "with_host",
    "write_with_manifest",
]
