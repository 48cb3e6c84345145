"""Render the round-7 final-numbers table from the two committed final
bench windows + the round-start bench, for OPTIMIZATION_r07.md.

    python tools/opt_r07_report.py <run1.json> <run2.json>
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

# driver round-6 medians quoted in VERDICT.md (the driver's own window)
DRIVER_R6 = {
    # VERDICT quotes the flagship as 22,959 docs/sec over 500k docs
    "pipeline": 21.8,
    "minhash_dedup": 6.92, "near_dup_clusters": 13.06,
    "simhash_dedup": 5.05, "incremental_dedup": 9.76,
    "embedding_near_dups": 7.72, "perplexity_terciles": 15.75,
    "quality_terciles": 1.04, "ann_lsh_topk": 1.29, "ann_ivf_topk": 1.95,
    "similarity_topk": 0.94, "semantic_dedup": 2.0, "dsir_scores": 4.1,
    "bpe_merges": 8.6, "exact_substring_dedup": 1.9, "pagerank": 8.3,
    "video_near_dups": 5.2, "cluster_representatives": 14.1,
    "pii_scrub": 0.35, "repetition_stats": 0.75, "event_sessions": 0.96,
}


def main() -> None:
    r1 = json.loads(Path(sys.argv[1]).read_text())
    r2 = json.loads(Path(sys.argv[2]).read_text())
    start = json.loads(
        subprocess.run(
            ["git", "show", "e22e6b5:BENCH/bench_full.json"],
            capture_output=True, text=True, cwd=ROOT,
        ).stdout
    )
    names = list(r1["queries"])
    print("| leg | round-start | final (best-of-2-window medians) | driver r6 |")
    print("|---|---|---|---|")
    tot1 = tot2 = tots = 0.0
    for n in sorted(names, key=lambda n: -min(r1["queries"][n], r2["queries"][n])):
        a = start["queries"].get(n)
        b = min(r1["queries"][n], r2["queries"][n])
        d = DRIVER_R6.get(n)
        tot1 += r1["queries"][n]
        tot2 += r2["queries"][n]
        tots += a or 0
        dd = f"{d:.2f}" if d else "—"
        print(f"| {n} | {a:.2f} | {b:.2f} | {dd} |")
    print()
    print(f"window totals: start {start['value']}, "
          f"run1 {r1['value']} (steal {r1['host_steal_frac']}), "
          f"run2 {r2['value']} (steal {r2['host_steal_frac']})")
    best = sum(min(r1["queries"][n], r2["queries"][n]) for n in names)
    print(f"best-of-window sum: {best:.1f}s")
    for tag, r in (("run1", r1), ("run2", r2)):
        p = r.get("pinned") or {}
        print(f"pinned {tag}: raw median {p.get('docs_per_sec')} "
              f"runs {p.get('docs_per_sec_runs')} "
              f"normalized {p.get('docs_per_sec_control_normalized')} "
              f"(control {(p.get('control') or {}).get('docs_per_sec')}, "
              f"host_factor {p.get('host_factor_vs_ref')})")


if __name__ == "__main__":
    main()
