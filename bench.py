"""Benchmark harness (EvaluateQuality-shaped, SURVEY.md §2.6 E3).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

The flagship number is the full langid+quality-filter pipeline throughput
(docs/sec) over the synthetic pages table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])
    from pyspark.sql import functions as F

    from language_detection_spark.config import get_spark
    from language_detection_spark.models.factory import load_default_model
    from language_detection_spark.operators.pipeline import (
        PipelineOptions,
        QualityFilterPipeline,
    )
    from language_detection_spark.operators.quality import QualityConfig
    from language_detection_spark.queries import queries as registry
    from language_detection_spark.sources.pages import synth_pages_df

    spark = get_spark("ldspark-bench")
    model = load_default_model()

    # materialize the pages table once (generation cost excluded from the
    # pipeline number, like the reference's corpus preload); replicate with
    # distinct urls so the pipeline number is work-bound, not startup-bound
    # (100× sf0.1 = 500k docs: ~15k docs/core at 32 cores, compute-dominated)
    replicate = int(os.environ.get("BENCH_REPLICATE", "100"))
    tag = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    pages_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"{tag}_bench_pages_x{replicate}"
    )
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        p = synth_pages_df(spark, sf_dir)
        if replicate > 1:
            p = p.withColumn(
                "_r", F.explode(F.sequence(F.lit(1), F.lit(replicate)))
            ).withColumn(
                "url", F.concat(F.col("url"), F.lit("?copy="), F.col("_r"))
            ).drop("_r")
        p.repartition(64).write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    n_docs = pages.count()

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    steals: dict[str, float] = {}
    # per-query median-of-N (default 3): single-shot numbers on this
    # shared-tenant VM wobble ±15% even at 0% steal, which round 3's
    # fast_langid "+54% regression" turned out to be — medians + per-query
    # steal context make round-over-round deltas interpretable
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    def _cpu_stat():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:9]))

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    stat_before = _cpu_stat()

    from language_detection_spark.plans.caching import release_tracked_caches

    def timed(name: str, fn):
        if only and name not in only:
            return
        walls, st = [], []
        for _ in range(max(1, repeats)):
            s0 = _cpu_stat()
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
            ds = [b - a for a, b in zip(s0, _cpu_stat())]
            st.append(round(ds[7] / max(sum(ds), 1), 4))
            # dedup/ANN operators persist intermediates for the action's
            # lifetime; release between queries so caches don't stack up
            release_tracked_caches()
        timings[name] = round(_median(walls), 3)
        runs[name] = walls
        steals[name] = round(max(st), 4)

    pipe = QualityFilterPipeline(
        spark,
        model,
        QualityConfig(lang_allow=("en",), min_stopword_hits=1),
        PipelineOptions(n_buckets=256),
    )
    timed("pipeline", lambda: pipe.run(pages).write.mode("overwrite").format(
        "noop"
    ).save())

    q = registry()
    timed("detect", lambda: q["detect_language_counts"](spark, sf_dir).collect())
    timed("fast_langid", lambda: q["fast_langid_counts"](spark, sf_dir).collect())
    timed("langid_v3", lambda: q["langid_v3_counts"](spark, sf_dir).collect())
    timed("train_grams", lambda: q["train_gram_counts"](spark, sf_dir).count())
    timed("minhash_dedup", lambda: q["minhash_near_dups"](spark, sf_dir).count())
    timed("exact_dedup", lambda: q["exact_dup_clusters"](spark, sf_dir).count())
    timed("doc_stats", lambda: q["doc_stats"](spark, sf_dir).count())
    timed("similarity_topk", lambda: q["similarity_topk"](spark, sf_dir).count())
    timed("ann_lsh_topk", lambda: q["ann_lsh_topk"](spark, sf_dir).count())
    timed("ann_ivf_topk", lambda: q["ann_ivf_topk"](spark, sf_dir).count())
    timed("simhash_dedup", lambda: q["simhash_near_dups"](spark, sf_dir).count())
    timed("near_dup_clusters",
          lambda: q["near_dup_clusters"](spark, sf_dir).count())
    timed("incremental_dedup",
          lambda: q["incremental_near_dups"](spark, sf_dir).count())
    timed("embedding_near_dups",
          lambda: q["embedding_near_dups"](spark, sf_dir).count())
    timed("pii_scrub", lambda: q["pii_scrub"](spark, sf_dir).count())
    timed("repetition_stats",
          lambda: q["repetition_stats"](spark, sf_dir).count())
    timed("event_sessions", lambda: q["event_sessions"](spark, sf_dir).count())
    timed("decontaminate",
          lambda: q["decontaminate_docs"](spark, sf_dir).count())
    timed("passage_dedup",
          lambda: q["passage_dedup_docs"](spark, sf_dir).count())
    timed("weighted_sample",
          lambda: q["source_weighted_sample"](spark, sf_dir).count())
    timed("holdout_split", lambda: q["holdout_split"](spark, sf_dir).count())
    timed("quality_terciles",
          lambda: q["quality_terciles"](spark, sf_dir).count())
    timed("perplexity_terciles",
          lambda: q["perplexity_terciles"](spark, sf_dir).count())
    timed("semantic_dedup", lambda: q["semantic_dedup"](spark, sf_dir).count())
    timed("dsir_scores", lambda: q["dsir_scores"](spark, sf_dir).count())
    timed("packed_sequences",
          lambda: q["packed_sequences"](spark, sf_dir).count())
    timed("language_rebalance",
          lambda: q["language_rebalance"](spark, sf_dir).count())
    timed("bpe_merges", lambda: q["bpe_merges"](spark, sf_dir).count())
    timed("exact_substring_dedup",
          lambda: q["exact_substring_dedup"](spark, sf_dir).count())
    timed("packed_documents",
          lambda: q["packed_documents"](spark, sf_dir).count())
    timed("text_chunks", lambda: q["text_chunks"](spark, sf_dir).count())
    timed("tfidf_top_terms",
          lambda: q["tfidf_top_terms"](spark, sf_dir).count())
    timed("bloom_dedup", lambda: q["bloom_dedup"](spark, sf_dir).count())
    timed("bpe_token_stats",
          lambda: q["bpe_token_stats"](spark, sf_dir).count())
    timed("nb_quality", lambda: q["nb_quality_scores"](spark, sf_dir).count())
    timed("c4_line_filter",
          lambda: q["c4_line_filter"](spark, sf_dir).count())
    timed("warc_roundtrip",
          lambda: q["warc_roundtrip_docs"](spark, sf_dir).count())
    timed("url_filter", lambda: q["url_filtered_docs"](spark, sf_dir).count())
    timed("word_lm", lambda: q["word_lm_scores"](spark, sf_dir).count())
    timed("link_stats", lambda: q["domain_link_stats"](spark, sf_dir).count())
    timed("pagerank", lambda: q["domain_pagerank"](spark, sf_dir).count())
    timed("latest_snapshots",
          lambda: q["latest_snapshots"](spark, sf_dir).count())
    timed("boilerplate", lambda: q["boilerplate_blocks"](spark, sf_dir).count())
    timed("page_directives",
          lambda: q["page_directives"](spark, sf_dir).count())
    timed("image_near_dups",
          lambda: q["image_near_dups"](spark, sf_dir).count())
    timed("audio_near_dups",
          lambda: q["audio_near_dups"](spark, sf_dir).count())
    timed("cluster_representatives",
          lambda: q["cluster_representatives"](spark, sf_dir).count())
    timed("web_curation",
          lambda: q["web_curation_pipeline"](spark, sf_dir).count())
    timed("video_near_dups",
          lambda: q["video_near_dups"](spark, sf_dir).count())
    timed("robots_allowed",
          lambda: q["robots_allowed_urls"](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    pipeline_sec = timings.get("pipeline", float("nan"))
    # hypervisor-steal fraction over the whole measured window: the sandbox
    # is a shared tenant and CPU-bound numbers swing 1.5-3x with neighbor
    # load (documented in BASELINE.md) — record the context with the number
    ds = [b - a for a, b in zip(stat_before, _cpu_stat())]
    steal_frac = round(ds[7] / max(sum(ds), 1), 4)
    out = {
        "metric": "langid+quality-filter pipeline wall time (headline: docs_per_sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_runs": runs,
        "query_steal_max": steals,
        "repeats_per_query": max(1, repeats),
        "aggregation": "median",
        # protocol version: r2/r3 committed SINGLE-SHOT COLD walls; r4+
        # commits the median of N repeats in one session (run 1 is the
        # cold run — see query_runs for the full series).  Compare r4
        # medians to earlier rounds' numbers only via query_runs[0].
        "protocol": "bench-v2-median-of-repeats-warm",
        "sf": sf_dir,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / pipeline_sec, 1) if pipeline_sec else None,
        "cores": int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count(),
        "host_steal_frac": steal_frac,
    }
    spark.stop()

    # pinned-core protocol datapoint (BASELINE.md): the same pipeline via
    # taskset+spark-submit at 16 cores, directly comparable to the committed
    # BENCH/BASELINE.md headline (unpinned local[32] suffers 10-25%
    # hypervisor steal at full machine load — documented there).  Skippable
    # for quick iterating with BENCH_PINNED=0.
    if os.environ.get("BENCH_PINNED", "1") != "0" and (not only or "pinned" in only):
        # paired in-window control (round-6 protocol): a FIXED small
        # 1-core job runs immediately before the pinned leg.  Host
        # delivery on this VM swings 1.5-3× between sessions at low
        # steal, so a pinned rate is only interpretable relative to the
        # control measured in the SAME window — the ratio cancels host
        # drift exactly like the paired scaling protocol
        # (BENCH/scaling_paired_1core.json) proved.
        control = _control_pipeline()
        # median-of-N: round-6 measured FOUR identical pinned runs in one
        # zero-steal window at 4916/7018/5021/4045 docs/sec — a 1.74×
        # spread with no steal and no code change.  A single-shot pinned
        # datapoint is meaningless on this VM; the series needs a median.
        p_repeats = int(os.environ.get("BENCH_PINNED_REPEATS", "3"))
        p_runs = [
            _pinned_pipeline(pages_dir, n_docs) for _ in range(p_repeats)
        ]
        rates = sorted(
            r["docs_per_sec"] for r in p_runs if r.get("docs_per_sec")
        )
        pinned = dict(p_runs[0])
        if rates:
            mid = (
                rates[len(rates) // 2]
                if len(rates) % 2
                else (rates[len(rates) // 2 - 1] + rates[len(rates) // 2]) / 2
            )
            pinned["docs_per_sec"] = round(mid, 1)
            pinned["docs_per_sec_runs"] = rates
            pinned["aggregation"] = f"median-of-{len(rates)}"
        if "docs_per_sec" in control and pinned.get("docs_per_sec"):
            ref = CONTROL_REF_DOCS_PER_SEC
            factor = control["docs_per_sec"] / ref
            pinned["control"] = control
            pinned["control_ref_docs_per_sec"] = ref
            pinned["host_factor_vs_ref"] = round(factor, 4)
            pinned["docs_per_sec_control_normalized"] = round(
                pinned["docs_per_sec"] / factor, 1
            )
        else:
            pinned["control"] = control
        out["pinned"] = pinned
    line = json.dumps(out)
    # the driver scrapes the LAST stdout line, which a long session's
    # buffering can truncate (r5 lost five queries' runs) — persist the
    # complete JSON to a file as well (full runs only; partial/filtered
    # runs must not clobber the round artifact)
    if not only:
        full = Path(__file__).resolve().parent / "BENCH" / "bench_full.json"
        full.parent.mkdir(exist_ok=True)
        full.write_text(line + "\n")
    print(line)


# Reference rate for the in-window control job, established round 6 at
# 0.0% measured steal: median of 3 runs = 589.8 docs/sec
# (589.8 / 560.0 / 629.5 — ±6% run-to-run wobble is the VM's floor; see
# BENCH/BASELINE.md "pinned control" section).  The control is FROZEN:
# 1 core (core 2 — core 0 handles IRQs on this VM), local[1], full
# pipeline job over sf0.1 pages replicated ×6 (30,000 docs), same
# spark-submit protocol as the pinned leg.
CONTROL_REF_DOCS_PER_SEC = float(
    os.environ.get("BENCH_CONTROL_REF", "589.8")
)


def _control_pipeline() -> dict:
    """The frozen 1-core control job — measures what the host is
    delivering in THIS window, in the same units as the pinned leg."""
    import shutil
    import subprocess

    root = Path(__file__).resolve().parent
    subprocess.run(
        [sys.executable, str(root / "tools" / "make_dist.py")],
        check=True, capture_output=True,
    )
    sf_dir = "/root/testdata/sf0.1"
    tag = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    pages_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"{tag}_bench_pages_x6_control"
    )
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        from pyspark.sql import SparkSession
        from pyspark.sql import functions as F

        from language_detection_spark.sources.pages import synth_pages_df

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("control-pages-gen")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        p = synth_pages_df(spark, sf_dir)
        p = p.withColumn(
            "_r", F.explode(F.sequence(F.lit(1), F.lit(6)))
        ).withColumn(
            "url", F.concat(F.col("url"), F.lit("?copy="), F.col("_r"))
        ).drop("_r")
        p.repartition(8).write.mode("overwrite").parquet(pages_dir)
        spark.stop()
    out_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "bench_control_out"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    cmd = [
        "taskset", "-c", "2",
        "spark-submit",
        "--master", "local[1]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=4g",
        "--py-files", str(root / "dist" / "pipeline.zip"),
        str(root / "jobs" / "run_pipeline.py"),
        "--input", pages_dir,
        "--output", out_dir,
        "--buckets", "16",
        "--chunk", "64",
        "--no-resume",
    ]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=root)
    if proc.returncode != 0:
        return {"error": proc.stderr[-500:]}
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    return {
        "protocol": "control-v1-1core-30k-docs-core2",
        "docs_per_sec": res.get("docs_per_sec"),
        "wall_sec": res.get("wall_sec"),
        "launch_wall_sec": round(time.time() - t0, 1),
    }


def _pinned_pipeline(pages_dir: str, n_docs: int, cores: int = 16) -> dict:
    import shutil
    import subprocess

    root = Path(__file__).resolve().parent
    subprocess.run(
        [sys.executable, str(root / "tools" / "make_dist.py")],
        check=True, capture_output=True,
    )
    out_dir = os.path.join(os.environ.get("TMPDIR", "/tmp"), "bench_pinned_out")
    shutil.rmtree(out_dir, ignore_errors=True)
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={2 * cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=8g",
        "--py-files", str(root / "dist" / "pipeline.zip"),
        str(root / "jobs" / "run_pipeline.py"),
        "--input", pages_dir,
        "--output", out_dir,
        "--buckets", "64",
        "--chunk", "64",
        "--no-resume",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=root)
    if proc.returncode != 0:
        return {"error": proc.stderr[-500:]}
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    return {
        "cores": cores,
        "pinned": True,
        # protocol version for round-over-round comparability: v1 (round 2)
        # measured the pipeline compute only; v2 (round 3+) runs the full
        # job — checkpointed partitioned write + audit commit included —
        # so v2 rates are NOT comparable to v1 rates
        "protocol": "pinned-v2-full-job-with-checkpointed-write-audit",
        "launch": "taskset spark-submit --py-files (BASELINE.md protocol)",
        "n_docs": n_docs,
        "docs_per_sec": res.get("docs_per_sec"),
        "wall_sec": res.get("wall_sec"),
        "rows_kept": (res.get("metrics") or {}).get("rows_kept"),
        # this rate divides by a wall that INCLUDES JVM/spark-submit startup
        # and the checkpointed partitioned write+audit protocol; the
        # steady-state pipeline rates in BENCH/scaling.json amortize startup
        # over 2x the docs — the two are not directly comparable
        "note": "wall includes JVM startup + checkpointed write/audit; "
                "see BENCH/scaling.json for steady-state scaling rates",
    }


if __name__ == "__main__":
    main()
