"""Extra (non-frozen) benchmarks: noop-sink isolation and stage decomposition.

bench.py is the FROZEN driver contract; this file holds the round-6
optimization-round instrumentation the guide (§1.4) asks for:
  - per-query noop-sink timing (computation only, no count()-pruning),
  - a stage-by-stage decomposition of the dedup_canonical chain,
  - .explain("formatted") capture into plans/r06/.

Usage:
  python bench_extra.py decompose       # dedup chain stage timings
  python bench_extra.py plans [suffix]  # write plans/r06/<q>_<suffix>.txt
  python bench_extra.py noop            # noop-sink per-query timings
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bench import _bench_rules_df, _ensure_corpus, _warm
from ukeeper_readability_spark.jobs.extract_job import (
    get_spark,
    join_rules,
    load_transcripts,
    run_extraction,
    run_extraction_bytes,
)
from ukeeper_readability_spark.pipeline import (
    cosine_topk_bruteforce,
    minhash_lsh_pairs,
    ngram_jaccard,
)
from ukeeper_readability_spark.pipeline.dedup import (
    dedup_components,
    minhash_signatures,
)
from ukeeper_readability_spark.pipeline.sessions import sessionize


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _setup():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name=f"bench-extra-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    spark.sparkContext.setLogLevel("ERROR")
    paths = _ensure_corpus(spark, sf_dir, 4, 2400)
    return spark, sf_dir, cpus, paths


def _dedup_corpus(spark, paths):
    return load_transcripts(spark, paths["docs"]).select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias(
            "doc_id"
        ),
        "text",
    )


def decompose() -> None:
    """Stage decomposition of the dedup_canonical bench thunk (the 19 s
    headline row): where inside the chain does the time go?"""
    spark, sf_dir, cpus, paths = _setup()
    _warm(spark, cpus)
    sc = spark.sparkContext
    out: dict = {}

    spark.conf.set("spark.sql.shuffle.partitions", str(cpus * 8))
    corpus = _dedup_corpus(spark, paths)
    out["corpus_count"] = corpus.count()

    sc.setJobDescription("decompose: signatures noop")
    out["signatures_noop"] = noop(
        minhash_signatures(corpus, shingle_n=3, k=16)
    )
    sc.setJobDescription("decompose: lsh pairs count")
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(corpus, shingle_n=3, k=16, bands=4)
    out["pairs_n"] = pairs.count()
    out["pairs_count_sec"] = round(time.perf_counter() - t0, 3)

    sc.setJobDescription("decompose: jaccard verify count")
    t0 = time.perf_counter()
    verified = (
        ngram_jaccard(corpus, pairs, shingle_n=3)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    out["verified_n"] = verified.count()
    out["verify_count_sec"] = round(time.perf_counter() - t0, 3)

    sc.setJobDescription("decompose: components")
    t0 = time.perf_counter()
    st: dict = {"round_sec": []}
    comp = dedup_components(verified, stats=st)
    out["components_n"] = comp.count()
    out["components_sec"] = round(time.perf_counter() - t0, 3)
    out["components_stats"] = st

    sc.setJobDescription("decompose: canonical left join")
    t0 = time.perf_counter()
    n = (
        corpus.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component_id", "doc_id").alias("canonical_id")
        )
        .count()
    )
    out["final_join_sec"] = round(time.perf_counter() - t0, 3)
    out["final_n"] = n

    # end-to-end for reference (same composition as bench.py's thunk)
    sc.setJobDescription("decompose: end-to-end")
    t0 = time.perf_counter()
    pairs2 = minhash_lsh_pairs(_dedup_corpus(spark, paths), shingle_n=3, k=16, bands=4)
    verified2 = (
        ngram_jaccard(_dedup_corpus(spark, paths), pairs2, shingle_n=3)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    comp2 = dedup_components(verified2)
    (
        _dedup_corpus(spark, paths)
        .select("doc_id")
        .join(comp2, "doc_id", "left")
        .select("doc_id", F.coalesce("component_id", "doc_id").alias("canonical_id"))
        .count()
    )
    out["end_to_end_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))
    spark.stop()


def _bench_queries(spark, sf_dir, cpus, paths):
    """The same 10 compositions bench.py times, as (name, df-thunk) pairs."""
    rules_df = _bench_rules_df(spark, sf_dir)

    def docs_plain():
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        return run_extraction(
            join_rules(load_transcripts(spark, paths["docs"]), None),
            num_partitions=None,
        )

    def docs_rule():
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        return run_extraction(
            join_rules(load_transcripts(spark, paths["docs"]), rules_df),
            num_partitions=None,
        )

    def fixtures():
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        return run_extraction(
            join_rules(load_transcripts(spark, paths["fixtures"]), None),
            num_partitions=None,
        )

    def docs_bytes():
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        trans = load_transcripts(spark, paths["docs"])
        joined = (
            trans.withColumn("body_bytes", F.encode("text", "UTF-8"))
            .withColumn("header_content_type", F.lit("text/html; charset=utf-8"))
            .withColumn("rule_content", F.lit(None).cast("string"))
            .withColumn("routed_cloudflare", F.lit(False))
        )
        return run_extraction_bytes(joined, num_partitions=None)

    def lsh():
        return minhash_lsh_pairs(
            _dedup_corpus(spark, paths), shingle_n=3, k=16, bands=4
        )

    def canonical():
        corpus = _dedup_corpus(spark, paths)
        pairs = minhash_lsh_pairs(corpus, shingle_n=3, k=16, bands=4)
        verified = (
            ngram_jaccard(corpus, pairs, shingle_n=3)
            .filter(F.col("jaccard") >= 0.5)
            .select("doc_a", "doc_b")
        )
        comp = dedup_components(verified)
        return (
            corpus.select("doc_id")
            .join(comp, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("component_id", "doc_id").alias("canonical_id"),
            )
        )

    def ev_scan():
        return spark.read.parquet(paths["events"]).select(
            F.bit_xor(F.xxhash64("user_id", "event_id", "ts", "value"))
        )

    def ev_sess():
        return sessionize(spark.read.parquet(paths["events"]), gap_minutes=30)

    def ev_sess_bkt():
        return sessionize(spark.table("bench_events_bkt"), gap_minutes=30)

    def ann():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
            cpus * 2
        )
        qs = emb.filter(F.col("vec_id") % 50 == 0).selectExpr(
            "vec_id AS query_id", "embedding", "label"
        )
        return cosine_topk_bruteforce(emb, qs, k=10)

    return [
        ("extract_documents_boilerplate", docs_plain),
        ("extract_rule_path", docs_rule),
        ("extract_fixture_articles", fixtures),
        ("extract_bytes_path", docs_bytes),
        ("dedup_minhash_lsh", lsh),
        ("dedup_canonical", canonical),
        ("events_scan", ev_scan),
        ("events_sessionize", ev_sess),
        ("events_sessionize_bucketed", ev_sess_bkt),
        ("ann_cosine_bruteforce", ann),
    ]


def plans(suffix: str) -> None:
    spark, sf_dir, cpus, paths = _setup()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name, thunk in _bench_queries(spark, sf_dir, cpus, paths):
        if name == "dedup_canonical":
            # iterative: the interesting plans are the stage plans; capture
            # the verified-pairs plan (scan→LSH→jaccard-verify) instead of
            # driving the loop
            corpus = _dedup_corpus(spark, paths)
            pairs = minhash_lsh_pairs(corpus, shingle_n=3, k=16, bands=4)
            df = (
                ngram_jaccard(corpus, pairs, shingle_n=3)
                .filter(F.col("jaccard") >= 0.5)
                .select("doc_a", "doc_b")
            )
            fname = f"dedup_canonical_verified_pairs_{suffix}.txt"
        else:
            df = thunk()
            fname = f"{name}_{suffix}.txt"
        with open(os.path.join(outdir, fname), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
        print("wrote", fname)
    spark.stop()


def noop_mode() -> None:
    spark, sf_dir, cpus, paths = _setup()
    _warm(spark, cpus)
    sc = spark.sparkContext
    out = {}
    for name, thunk in _bench_queries(spark, sf_dir, cpus, paths):
        sc.setJobDescription(f"noop: {name}")
        if name == "dedup_canonical":
            spark.conf.set("spark.sql.shuffle.partitions", str(cpus * 8))
        out[name] = noop(thunk())
        spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "decompose"
    if mode == "decompose":
        decompose()
    elif mode == "plans":
        plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif mode == "noop":
        noop_mode()
    else:
        raise SystemExit(f"unknown mode {mode!r}")
