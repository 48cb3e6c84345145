"""Shuffle-byte A/B for the ExactSubstr two-level duplicate decision.

Round-6 verdict flagged the one-level formulation: the duplicate
decision keyed the window STRING, shipping ~k-word text through two
exchanges (groupBy + stats join) — ~2k x corpus words on the wire at
scale.  The two-level form aggregates the 8-byte xxhash64 first and
resolves only colliding buckets on strings.  This harness runs both
formulations on a replicated sf0.1 corpus with the event log enabled and
reports total shuffle bytes written per variant (bytes are deterministic
— host load cannot change them).

    python bench/xsub_shuffle_ab.py [replicate]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

LOG_DIR = "/tmp/xsub_sparklogs"


def one_level_decision(occ):
    """The round-6 formulation: duplicate decision keyed on the window
    string (kept here verbatim as the A side of the byte comparison)."""
    from pyspark.sql import functions as F

    stats = occ.groupBy("win").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct("_id", "pos")).alias("first"),
    )
    marked = occ.join(stats, "win").select(
        "_id",
        "pos",
        (
            (F.col("cnt") > 1)
            & ~(
                (F.col("_id") == F.col("first._id"))
                & (F.col("pos") == F.col("first.pos"))
            )
        ).alias("is_dup"),
    )
    return marked.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.col("is_dup").cast("int")).alias("n_dup_windows"),
    )


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    shutil.rmtree(LOG_DIR, ignore_errors=True)
    os.makedirs(LOG_DIR, exist_ok=True)

    from pyspark.sql import functions as F

    from language_detection_spark.config import get_spark
    from language_detection_spark.operators.dedup import exact_substring_dedup

    spark = get_spark(
        "xsub-shuffle-ab",
        **{
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{LOG_DIR}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs = (
        docs.withColumn("_r", F.explode(F.sequence(F.lit(1), F.lit(replicate))))
        .select(
            (F.col("doc_id") * replicate + F.col("_r")).alias("doc_id"),
            "text",
        )
    )
    k = 8
    words = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size("words")
    base = docs.select(
        F.col("doc_id").alias("_id"),
        F.when(F.length(F.trim(F.col("text"))) == 0,
               F.array().cast("array<string>")).otherwise(words).alias("words"),
    )
    occ = (
        base.select(
            "_id", "words",
            F.explode(
                F.when(n >= k, F.sequence(F.lit(0), n - k))
                .otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
        .select(
            "_id", "pos",
            F.concat_ws(" ", F.slice(F.col("words"), F.col("pos") + 1, k))
            .alias("win"),
        )
    )

    sc = spark.sparkContext
    t0 = time.time()
    sc.setJobGroup("one_level", "one-level string decision")
    one_level_decision(occ).write.format("noop").mode("overwrite").save()
    w1 = time.time() - t0
    t0 = time.time()
    sc.setJobGroup("two_level", "two-level hash-then-string decision")
    # project to the same per-doc counters the A side computes, so both
    # variants materialize the identical decision output (Catalyst prunes
    # the span-rebuild subtree on this projection)
    exact_substring_dedup(docs, k=k).select(
        "doc_id", "n_windows", "n_dup_windows"
    ).write.format("noop").mode("overwrite").save()
    w2 = time.time() - t0
    app_id = sc.applicationId
    spark.stop()

    # attribute shuffle bytes written to job groups via the event log
    d = sorted(glob.glob(f"{LOG_DIR}/eventlog_v2_*"), key=os.path.getmtime)[-1]
    f = glob.glob(d + "/events_*")[0]
    if f.endswith(".zstd"):
        text = subprocess.run(["zstd", "-dc", f], capture_output=True,
                              text=True).stdout
    else:
        text = open(f).read()
    stage_group: dict[int, str] = {}
    bytes_by_group: dict[str, int] = {}
    rows_by_group: dict[str, int] = {}
    for line in text.splitlines():
        try:
            e = json.loads(line)
        except Exception:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            grp = e.get("Properties", {}).get("spark.jobGroup.id", "?")
            for sid in e.get("Stage IDs", []):
                stage_group[sid] = grp
        elif ev == "SparkListenerTaskEnd":
            m = (e.get("Task Metrics") or {}).get("Shuffle Write Metrics")
            if m:
                g = stage_group.get(e.get("Stage ID"), "?")
                bytes_by_group[g] = bytes_by_group.get(g, 0) + m.get(
                    "Shuffle Bytes Written", 0
                )
                rows_by_group[g] = rows_by_group.get(g, 0) + m.get(
                    "Shuffle Records Written", 0
                )
    out = {
        "replicate": replicate,
        "n_docs": 5000 * replicate,
        "app_id": app_id,
        "one_level": {
            "shuffle_bytes_written": bytes_by_group.get("one_level", 0),
            "shuffle_records_written": rows_by_group.get("one_level", 0),
            "wall_sec": round(w1, 2),
        },
        "two_level": {
            "shuffle_bytes_written": bytes_by_group.get("two_level", 0),
            "shuffle_records_written": rows_by_group.get("two_level", 0),
            "wall_sec": round(w2, 2),
        },
    }
    b1 = out["one_level"]["shuffle_bytes_written"]
    b2 = out["two_level"]["shuffle_bytes_written"]
    out["bytes_ratio_one_over_two"] = round(b1 / b2, 2) if b2 else None
    # keyed by replicate so the realistic (x1, natural duplication) and
    # adversarial (x10, 100%-duplicated) datapoints both persist
    path = ROOT / "BENCH" / "xsub_shuffle_ab.json"
    try:
        merged = json.loads(path.read_text())
        if "one_level" in merged:  # legacy single-run layout
            merged = {str(merged.get("replicate", "?")): merged}
    except (FileNotFoundError, ValueError):
        merged = {}
    merged[str(replicate)] = out
    path.write_text(json.dumps(merged, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
