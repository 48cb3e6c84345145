"""Quality-ranked cluster representatives: keep-best semantics, tie
break, custom score column, plan shape."""

from pyspark.sql import functions as F

from language_detection_spark.operators.dedup import cluster_representatives

_BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong potions near the old stone bridge at dawn every single "
    "morning with great care and focus"
)  # 30 words
_EXTRA = _BASE + " plus five more useful trailing words"  # 36 words
_OTHER = (
    "galaxies rotate slowly beneath crystal domes while curious engineers "
    "calibrate humming turbines inside vast orbital workshops, recording "
    "temperature drift, pressure waves, and subtle vibrations across "
    "every panel of the station hull during long maintenance cycles"
)


def _docs(spark):
    rows = [
        (0, _BASE),
        (1, _EXTRA),          # same cluster, more words -> higher score
        (2, _BASE),
        (10, _OTHER),                        # cluster B: exact pair, tie
        (11, _OTHER),
        (20, "completely unrelated tiny text"),  # no cluster
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_keeps_highest_quality_member(spark):  # noqa: F811
    reps = {
        r["cluster_id"]: r
        for r in cluster_representatives(_docs(spark)).collect()
    }
    a = reps[0]
    assert a["cluster_size"] == 3
    assert a["kept_doc_id"] == 1, "36-word variant outranks 30-word copies"
    b = reps[10]
    assert b["cluster_size"] == 2
    assert b["kept_doc_id"] == 10, "equal scores tie-break to lowest id"
    assert 20 not in {r["kept_doc_id"] for r in reps.values()}
    assert set(reps) == {0, 10}


def test_custom_score_column(spark):  # noqa: F811
    """Any deterministic Column works as the ranking signal — here
    'prefer the HIGHEST doc id' via score=doc_id."""
    reps = {
        r["cluster_id"]: r["kept_doc_id"]
        for r in cluster_representatives(
            _docs(spark), score=F.col("doc_id").cast("double")
        ).collect()
    }
    assert reps == {0: 2, 10: 11}


def test_argmax_plan_has_no_window(spark):  # noqa: F811
    """The representative argmax is a partial-aggregating groupBy
    (max of struct), not a corpus-wide window."""
    plan = (
        cluster_representatives(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
