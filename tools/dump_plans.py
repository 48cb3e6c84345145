"""Dump explain('formatted') physical plans for the headline queries to
BENCH/plans/*.txt — review artifacts for the plan-shape claims (pushed
filters, pruned schemas, single ArrowEvalPython, no global windows,
broadcast joins, zero-exchange bucketed joins).

    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

PLAN_QUERIES = [
    "lang_keep_filter",        # PushedFilters + pruned ReadSchema
    "doc_stats",               # pure-expression codegen
    "similarity_topk",         # two-phase windows (no global per-query)
    "ann_lsh_topk",            # bucket join + probes
    "ann_ivf_topk",            # centroid lists
    "minhash_near_dups",       # banded join + bucket caps + verify join
    "simhash_near_dups",       # chunk-blocked self-join
    "orders_by_region",        # broadcast join chain
    "lineitem_pricing_summary",  # partial+final hash agg
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from language_detection_spark.config import get_spark
    from language_detection_spark.queries import queries

    out_dir = ROOT / "BENCH" / "plans"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    qs = queries()
    for name in PLAN_QUERIES:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}.txt").write_text(plan)
        print(f"wrote plans/{name}.txt ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
