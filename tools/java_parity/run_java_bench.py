"""Head-to-head single-core throughput: the reference's own compiled Java
Detector vs our vectorized detect_batch, same 53 profiles, same europarl
texts, both pinned to one core.

    taskset -c <core> python tools/java_parity/run_java_bench.py [n_texts] [core]

(core defaults to 2: core 0 services IRQs on this VM and depresses either
side ~20%; pass the same core you taskset the python side to)
"""

from __future__ import annotations

import base64
import json
import pathlib
import subprocess
import sys
import time

HERE = pathlib.Path(__file__).resolve().parent
ROOT = HERE.parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(HERE))

from run_parity import EUROPARL, PROFILES, build, export_profiles  # noqa: E402


def main() -> int:
    n_texts = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    core = sys.argv[2] if len(sys.argv) > 2 else "2"
    work = pathlib.Path("/tmp/java_parity")
    work.mkdir(exist_ok=True)
    langs = sorted(
        f.name for f in PROFILES.iterdir()
        if f.is_file() and not f.name.startswith(".")
    )
    classes = build(work)
    # build() compiles only the parity harness list; add the bench harness
    subprocess.run(
        ["javac", "-encoding", "utf-8", "-cp", str(classes), "-d", str(classes),
         str(HERE / "ThroughputHarness.java")],
        check=True,
    )
    prof_dir = export_profiles(work, langs)

    rows = [
        line.split("\t", 1)
        for line in EUROPARL.read_text(encoding="utf-8").splitlines()
    ]
    texts = [t for _, t in rows[:n_texts]]
    tf = work / "bench_texts.b64"
    tf.write_text(
        "\n".join(
            base64.b64encode(t.encode("utf-8")).decode("ascii") for t in texts
        ),
        encoding="ascii",
    )
    proc = subprocess.run(
        ["taskset", "-c", core, "java", "-cp", str(classes),
         "ThroughputHarness", str(prof_dir), str(tf), str(min(2000, n_texts))],
        capture_output=True, text=True, check=True,
    )
    n_s, sec_s, _ = proc.stdout.strip().split("\t")
    java_dps = int(n_s) / float(sec_s)

    import numpy as np

    from language_detection_spark.models.factory import DetectorModel
    from language_detection_spark.operators.detector import detect_batch

    model = DetectorModel.load_directory(PROFILES)
    seeds = np.array([1000 + 7 * i for i in range(len(texts))])
    detect_batch(model, texts[:500], seeds[:500])  # numpy warmup
    t0 = time.time()
    detect_batch(model, texts, seeds)
    ours_dps = len(texts) / (time.time() - t0)

    out = {
        "n_docs": len(texts),
        "java_reference_docs_per_sec": round(java_dps, 1),
        "ours_docs_per_sec": round(ours_dps, 1),
        "speedup_vs_reference": round(ours_dps / java_dps, 2),
        "protocol": f"single core (taskset -c {core} for java; run this script "
                    "under the same taskset so the python side is pinned too), "
                    "JIT/numpy warmup, same 53 profiles + europarl texts, "
                    "seeded per doc",
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
