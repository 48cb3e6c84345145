"""Dump explain('formatted') plans for the round-7 optimization targets to
plans/r07/<query>_<tag>.txt (tag = before/after).

    python tools/dump_plans_r07.py <tag> [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

DEFAULT_QUERIES = [
    "minhash_near_dups",
    "simhash_near_dups",
    "near_dup_clusters",
    "cluster_representatives",
    "incremental_near_dups",
    "embedding_near_dups",
    "bpe_token_stats",
    "dsir_scores",
    "decontaminate_docs",
    "video_near_dups",
    "domain_pagerank",
    "language_rebalance",
    "fast_langid_counts",
    "pipeline_keep_drop",
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = "/root/testdata/sf0.1"
    from language_detection_spark.config import get_spark
    from language_detection_spark.queries import queries

    out_dir = ROOT / "plans" / "r07"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans-r07")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # plan-only dump must not die on one query
            plan = f"PLAN DUMP FAILED: {exc!r}\n"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote plans/r07/{name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
