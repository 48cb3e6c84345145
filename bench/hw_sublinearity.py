"""Platform-sublinearity control for the scaling protocol — NO Spark.

Question it answers: when the 4-worker×4-core leg of
bench/scaling_multiworker.py shows per-worker rates below the idle-machine
1-worker leg, is that the ENGINE failing to scale, or the shared-VM
HARDWARE delivering less per active core as more cores light up
(memory bandwidth, LLC, turbo/co-scheduling)?

Method: run the detector's actual hot kernel (detect_batch — pure
numpy, no Spark, no JVM, no IPC, each process fully independent) in P
taskset-pinned worker PROCESSES for P in {1, 4, 5, 8, 16}, each process on
its own core working on its own in-memory copy of the europarl texts.
Per-core throughput vs P is then a property of the PLATFORM alone: these
processes share literally nothing but the machine.

If per-core rate at P=16 / per-core rate at P=4 ≈ the Spark protocol's
per-worker degradation, the whole multi-worker "efficiency gap" is
platform, not engine — a real N→4N cluster on separate machines would
not see it.

    python bench/hw_sublinearity.py    # writes BENCH/hw_sublinearity.json
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def _find_europarl() -> pathlib.Path:
    return next(pathlib.Path("/root/reference").rglob("europarl.18.test"))


def _worker(core: int, n_docs: int, seconds: float, q: mp.Queue) -> None:
    os.sched_setaffinity(0, {core})
    from language_detection_spark.models.factory import load_default_model
    from language_detection_spark.operators.detector import detect_batch

    model = load_default_model()
    rows = [
        l.split("\t", 1)
        for l in _find_europarl().read_text(encoding="utf-8").splitlines()[:n_docs]
    ]
    texts = [t for _, t in rows]
    seeds = [1000 + 7 * i for i in range(len(texts))]
    detect_batch(model, texts[:300], seeds[:300])  # warmup
    done = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        detect_batch(model, texts, seeds)
        done += len(texts)
    q.put((core, done / (time.time() - t0)))


def run_p(p: int, n_docs: int = 2000, seconds: float = 25.0) -> dict:
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(core, n_docs, seconds, q))
        for core in range(p)
    ]
    for pr in procs:
        pr.start()
    rates = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    total = sum(r for _, r in rates)
    return {
        "processes": p,
        "docs_per_sec_total": round(total, 1),
        "docs_per_sec_per_core": round(total / p, 1),
        "per_core": {str(c): round(r, 1) for c, r in sorted(rates)},
    }


def main() -> None:
    mp.set_start_method("spawn", force=True)
    out = {"kernel": "detect_batch (pure numpy, no Spark/JVM/IPC)",
           "doc_set": "europarl.18.test first 2000 (~200 B/doc)",
           "runs": []}
    for p in (1, 4, 5, 8, 16):
        r = run_p(p)
        out["runs"].append(r)
        print(json.dumps(r), flush=True)
    by_p = {r["processes"]: r["docs_per_sec_per_core"] for r in out["runs"]}
    out["per_core_ratio_16_over_4"] = round(by_p[16] / by_p[4], 3)
    # the paired 1-core-worker protocol runs 5 active cores in its 4N leg
    # and 1 in its N leg — this ratio is ITS platform ceiling
    out["per_core_ratio_5_over_1"] = round(by_p[5] / by_p[1], 3)
    out["reading"] = (
        "per_core_ratio_16_over_4 is the fraction of per-core throughput the "
        "PLATFORM retains going from 4 to 16 active cores with zero software "
        "coupling; divide the Spark multi-worker protocol's raw efficiency by "
        "this to isolate engine scaling"
    )
    (ROOT / "BENCH" / "hw_sublinearity.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(json.dumps({"per_core_ratio_16_over_4": out["per_core_ratio_16_over_4"]}))


if __name__ == "__main__":
    main()
