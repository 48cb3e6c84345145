"""Merge fresh paired-control scaling repeats into the pooled series.

bench/scaling_multiworker.py OVERWRITES BENCH/scaling_paired_1core.json;
this tool pools the old repeats back in (unconditionally — no selection)
and recomputes the pooled medians.  Usage:

    python tools/merge_scaling_pool.py /tmp/scaling_pool_18.json

where the argument is the stashed pre-run pool; the freshly-written
BENCH/scaling_paired_1core.json supplies the new repeats.
"""

import json
import statistics
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
POOL = ROOT / "BENCH" / "scaling_paired_1core.json"


def eff(rep):
    # every repeat stores its ratios (scaling_multiworker.py main_paired)
    return rep["raw_eff"], rep["engine_eff"], rep["platform_tax"]


def main():
    old = json.loads(Path(sys.argv[1]).read_text())
    new = json.loads(POOL.read_text())
    merged = dict(new)
    merged["repeats"] = old["repeats"] + new["repeats"]
    raws, engines, taxes = zip(*(eff(r) for r in merged["repeats"]))
    merged["raw_eff_median"] = round(statistics.median(raws), 3)
    merged["engine_eff_median"] = round(statistics.median(engines), 3)
    merged["platform_tax_median"] = round(statistics.median(taxes), 3)
    merged["meets_target"] = merged["raw_eff_median"] >= merged.get(
        "target", 0.8
    )
    n = len(merged["repeats"])
    merged["pooling_note"] = (
        f"{n} paired-control repeats pooled across rounds 3-6 (6+ "
        "sessions, merged unconditionally — no selection)"
    )
    merged["pooled_summary"] = {
        "raw_effs": [round(x, 3) for x in raws],
        "engine_effs": [round(x, 3) for x in engines],
        "n_ge_target": sum(1 for x in raws if x >= 0.8),
    }
    POOL.write_text(json.dumps(merged, indent=1) + "\n")
    print(
        json.dumps(
            {
                "n": n,
                "raw_median": merged["raw_eff_median"],
                "engine_median": merged["engine_eff_median"],
                "new_raws": [round(x, 3) for x in raws[-len(new["repeats"]):]],
            }
        )
    )


if __name__ == "__main__":
    main()
