"""Re-crawl collapse (latest_snapshot): winner semantics, tie-break,
and the no-window plan shape."""

from language_detection_spark.operators.text_analysis import latest_snapshot


def test_latest_capture_wins_and_variants_merge(spark):
    rows = [
        (1, "https://www.example.com/a?utm_source=x", 100),
        (2, "https://example.com/a", 300),
        (3, "HTTP://EXAMPLE.COM:80/a/", 200),  # http != https: own group
        (4, "https://example.com/b", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, warc_ts bigint")
    got = {r["canonical_url"]: r for r in latest_snapshot(df).collect()}
    a = got["https://example.com/a"]
    assert (a["n_snapshots"], a["latest_doc_id"], a["latest_ts"]) == (2, 2, 300)
    assert got["http://example.com/a"]["latest_doc_id"] == 3
    assert got["https://example.com/b"]["n_snapshots"] == 1


def test_timestamp_tie_breaks_on_doc_id(spark):
    rows = [
        (7, "https://example.com/t", 500),
        (9, "https://example.com/t", 500),
        (8, "https://example.com/t", 500),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, warc_ts bigint")
    (r,) = latest_snapshot(df).collect()
    assert (r["latest_doc_id"], r["n_snapshots"]) == (9, 3)


def test_plan_is_single_partial_agg_no_window(spark):
    df = spark.createDataFrame(
        [(i, f"https://example.com/p{i % 10}", i) for i in range(100)],
        "doc_id bigint, url string, warc_ts bigint",
    )
    plan = latest_snapshot(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") <= 1
    assert "partial_max" in plan or "partial" in plan
