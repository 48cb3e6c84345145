"""Engine-wide constants and SparkSession helpers.

Detector constants mirror the reference defaults
(`/root/reference/src/main/java/com/cybozu/labs/langdetect/Detector.java:70-90`).
"""

from __future__ import annotations

import os

ALPHA_DEFAULT = 0.5          # Detector.java:70
ALPHA_WIDTH = 0.05           # Detector.java:71
ITERATION_LIMIT = 1000       # Detector.java:73
PROB_THRESHOLD = 0.1         # Detector.java:74
CONV_THRESHOLD = 0.99999     # Detector.java:75
BASE_FREQ = 10000            # Detector.java:76
UNKNOWN_LANG = "unknown"     # Detector.java:77
N_TRIAL_DEFAULT = 7          # Detector.java:89
MAX_TEXT_LENGTH = 10000      # Detector.java:90
N_GRAM = 3                   # util/NGram.java:16

# LangProfile trim constants (util/LangProfile.java:28-29)
MINIMUM_FREQ = 2
LESS_FREQ_RATIO = 100000

# Default location of reference-format JSON language profiles.  The loader
# accepts any directory of shuyo-format profile JSON files; the engine
# BUNDLES the reference's 53 standard + 47 short-message profiles
# (Apache-2.0, same license as the already-bundled langid model) under
# language_detection_spark/data/profiles[.sm]/, so the shipped artifact
# runs with no external checkout.  $LANGDETECT_PROFILE_DIR overrides.


def bundled_profile_dir(short_messages: bool = False) -> str | None:
    """Filesystem path of the packaged profile directory, or ``None``
    when the package is imported from a zip (``--py-files pipeline.zip``)
    — callers fall back to importlib.resources traversal then."""
    from importlib import resources

    name = "profiles.sm" if short_messages else "profiles"
    t = resources.files("language_detection_spark.data").joinpath(name)
    p = str(t)
    return p if os.path.isdir(p) else None


DEFAULT_PROFILE_DIR = (
    os.environ.get("LANGDETECT_PROFILE_DIR")
    or bundled_profile_dir()
    or "bundled:profiles"
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "language-detection-spark", cores: int | None = None,
              shuffle_partitions: int | None = None, **extra):
    """Build a local SparkSession tuned for this engine.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all cores.  Arrow is enabled
    (all per-row compute rides Arrow-vectorized pandas UDFs), AQE is on so
    runtime stats can re-plan shuffles/skew at scale.
    """
    from pyspark.sql import SparkSession

    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # Spark 4.1's ChecksumCheckpointFileManager can deadlock its await
        # inside stateful-streaming state-store commits in local mode
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
        # default 10: above it Spark degrades parquet In pushdown to a
        # min/max range filter, which is useless for uniform hashes — the
        # sig-store trickle probe pushes up to ~1k literal band_hashes so
        # row groups in the range-clustered store can actually be skipped
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "2048")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
