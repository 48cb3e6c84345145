"""Per-leg component breakdowns (guide §1.4: noop-sink isolation).

NOT part of the frozen bench contract — bench.py is the graded artifact.
This harness times sub-steps of the expensive legs so OPTIMIZATION_r07.md
can attribute each second to an operator stage.

    python bench_extra.py [leg ...]     # default: all breakdowns
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    only = set(sys.argv[1:])
    from pyspark.sql import functions as F

    from language_detection_spark.config import get_spark
    from language_detection_spark.plans.caching import release_tracked_caches
    from language_detection_spark.queries import _docs
    from language_detection_spark.plans.repartition import parallelize_scan

    spark = get_spark("ldspark-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}

    def timed(leg, step, fn, repeats=3):
        if only and leg not in only:
            return
        walls = []
        for _ in range(repeats):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
            release_tracked_caches()
        out.setdefault(leg, {})[step] = sorted(walls)[len(walls) // 2]
        print(f"{leg:24s} {step:32s} {out[leg][step]:8.3f}  {walls}",
              flush=True)

    docs = parallelize_scan(_docs(spark, SF))

    # --- minhash ------------------------------------------------------
    from language_detection_spark.operators.dedup import (
        banded_rows,
        jaccard_for_pairs,
        lsh_candidate_pairs,
        minhash_dedup_pairs,
        minhash_signatures,
    )

    timed("minhash", "signatures_only",
          lambda: noop(minhash_signatures(docs)))
    timed("minhash", "banded_rows",
          lambda: noop(banded_rows(minhash_signatures(docs))))
    timed("minhash", "candidates",
          lambda: noop(lsh_candidate_pairs(minhash_signatures(docs))))
    timed("minhash", "full_pairs",
          lambda: noop(minhash_dedup_pairs(docs, threshold=0.5)))

    # --- simhash ------------------------------------------------------
    from language_detection_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_udf,
    )

    nonempty = docs.filter(F.length(F.trim(F.col("text"))) > 0)
    timed("simhash", "hash_only",
          lambda: noop(docs.select("doc_id",
                                   simhash_udf()(F.col("text")).alias("sh"))))
    timed("simhash", "full_pairs",
          lambda: noop(simhash_near_dup_pairs(nonempty, max_hamming=8)))

    # --- near_dup_clusters / cluster_representatives ------------------
    from language_detection_spark.operators.dedup import (
        connected_components,
        minhash_dedup_pairs as _mdp,
        near_dup_clusters,
    )

    def _edges():
        mh = _mdp(docs, threshold=0.5).select("id_a", "id_b")
        sh = simhash_near_dup_pairs(
            nonempty, max_hamming=8).select("id_a", "id_b")
        return mh.union(sh)

    def _cc_only():
        stats: dict = {}
        noop(connected_components(_edges(), stats=stats))
        print("    cc rounds:", stats, flush=True)

    timed("clusters", "edges_union", lambda: noop(_edges()))
    timed("clusters", "cc_from_edges", _cc_only)
    timed("clusters", "near_dup_clusters",
          lambda: noop(near_dup_clusters(docs)))

    # --- incremental --------------------------------------------------
    from language_detection_spark.operators.dedup import incremental_near_dups

    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    timed("incremental", "store_build",
          lambda: noop(banded_rows(minhash_signatures(old))))
    timed("incremental", "full",
          lambda: noop(incremental_near_dups(
              new, banded_rows(minhash_signatures(old)))))

    # --- embedding near dups ------------------------------------------
    from language_detection_spark.operators.similarity import (
        embedding_near_dup_pairs,
        hyperplane_bucket_udf,
    )
    from language_detection_spark.queries import _emb

    emb = _emb(spark, SF)
    timed("embedding", "bucket_only",
          lambda: noop(emb.select(
              "vec_id",
              hyperplane_bucket_udf(64, 4, 11)(F.col("embedding")))))
    timed("embedding", "full_pairs",
          lambda: noop(embedding_near_dup_pairs(
              emb, dim=64, threshold=0.9, n_planes=4, seed=11)))

    # --- bpe ----------------------------------------------------------
    from language_detection_spark.operators.tokenizer import (
        bpe_token_stats,
        train_bpe_merges,
        word_freq_table,
    )

    timed("bpe", "word_freq_only", lambda: noop(word_freq_table(docs)))
    timed("bpe", "train_24_merges", lambda: train_bpe_merges(docs), repeats=1)
    merges = train_bpe_merges(docs)
    timed("bpe", "token_stats_given_merges",
          lambda: noop(bpe_token_stats(docs, merges)))

    # --- pipeline ------------------------------------------------------
    from language_detection_spark.models.factory import load_default_model
    from language_detection_spark.operators.pipeline import (
        PipelineOptions,
        QualityFilterPipeline,
    )
    from language_detection_spark.operators.quality import QualityConfig

    if not only or "pipeline" in only:
        tag = SF.rstrip("/").replace("/", "_").lstrip("_")
        pages_dir = os.path.join(os.environ.get("TMPDIR", "/tmp"),
                                 f"{tag}_bench_pages_x100")
        if os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
            pages = spark.read.parquet(pages_dir)
            t0 = time.time()
            model = load_default_model()
            print(f"pipeline model_load {time.time()-t0:.3f}", flush=True)
            pipe = QualityFilterPipeline(
                spark, model,
                QualityConfig(lang_allow=("en",), min_stopword_hits=1),
                PipelineOptions(n_buckets=256))
            timed("pipeline", "annotate_run",
                  lambda: noop(pipe.run(pages)))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
