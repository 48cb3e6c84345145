"""Composed web-curation gate: per-gate drop attribution, keep verdict,
single-pass plan shape (zero corpus shuffles, zero Python)."""

import re

import pytest
from pyspark.sql import functions as F

from language_detection_spark.operators.url_filter import synth_blocklist
from language_detection_spark.operators.web_pipeline import (
    curate_web_pages,
    synth_web_pages,
)


@pytest.fixture(scope="module")
def curated(spark):  # noqa: F811
    text = (
        "the quick brown fox jumps over the lazy dog and it was a fine "
        "morning for everyone in the village by the river"
    )
    docs = spark.createDataFrame(
        [(i, text) for i in range(210)], "doc_id bigint, text string"
    )
    out = curate_web_pages(
        synth_web_pages(docs), blocklist=synth_blocklist(spark)
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_every_gate_attributes_drops(curated):
    dropped_url = [d for d, r in curated.items() if not r["keep_url"]]
    dropped_robots = [d for d, r in curated.items() if not r["keep_page"]]
    kept = [d for d, r in curated.items() if r["kept"]]
    assert dropped_url and dropped_robots and kept
    # robots gate: fixture cycles doc_id % 5 in (2, 4) -> noindex
    assert set(dropped_robots) == {d for d in curated if d % 5 in (2, 4)}
    # kept implies every gate passed
    for d in kept:
        r = curated[d]
        assert r["keep_url"] and r["keep_page"]
        assert r["n_content_blocks"] > 0 and r["q_score"] >= 0.1


def test_kept_is_exact_conjunction(curated):
    for r in curated.values():
        expected = (
            r["keep_url"]
            and r["keep_page"]
            and r["n_content_blocks"] > 0
            and r["q_score"] >= 0.1
        )
        assert r["kept"] == expected


def test_single_pass_plan(spark):  # noqa: F811
    """The corpus path never shuffles and never enters Python: the only
    hash Exchange is the 6-row blocklist dim's dedup, the dim reaches
    the join as a BroadcastExchange, and there is no EvalPython."""
    docs = spark.createDataFrame(
        [(0, "some words here")], "doc_id bigint, text string"
    )
    out = curate_web_pages(
        synth_web_pages(docs), blocklist=synth_blocklist(spark)
    )
    # the blocklist join no longer carries a forced broadcast hint (a
    # UT1-scale list must be able to fall back to a shuffle join), so AQE
    # picks the strategy at runtime — materialize and judge the FINAL
    # adaptive plan
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("Initial Plan")[0]
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]*)", plan)
    assert all("registered_domain" in e for e in exchanges), exchanges
    assert len(re.findall(r"BroadcastExchange", plan)) == 1
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_keep_cols_passthrough(spark):  # noqa: F811
    """The stage operators thread arbitrary input columns through —
    the mechanism that makes the one-pass composition possible."""
    from language_detection_spark.operators.url_filter import url_filter

    df = spark.createDataFrame(
        [(1, "https://example.com/a", "extra")],
        "doc_id bigint, url string, tag string",
    )
    out = url_filter(df, keep_cols=("tag",))
    assert out.columns[-1] == "tag"
    assert out.collect()[0]["tag"] == "extra"
