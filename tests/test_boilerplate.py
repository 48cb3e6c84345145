"""jusText-style boilerplate filter: per-gate goldens and plan shape."""

from language_detection_spark.operators.boilerplate import (
    boilerplate_filter,
    synth_boiler_pages,
)


def _one(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id bigint, html string")
    (r,) = boilerplate_filter(df).collect()
    return r


def test_nav_dropped_content_kept(spark):
    r = _one(
        spark,
        '<div><a href="/">Home</a> <a href="/x">X</a></div>'
        "<p>this is a perfectly normal sentence that it was for the "
        "reader and the test</p>",
    )
    assert r["n_blocks"] == 2 and r["n_content_blocks"] == 1
    assert r["content_text"].startswith("this is a perfectly")
    assert r["boiler_chars"] == len("Home X")


def test_short_block_dropped(spark):
    r = _one(spark, "<p>the of and is</p>")  # 4 words < 5
    assert r["n_content_blocks"] == 0


def test_stopword_gate(spark):
    # 6 words, 0 stopwords -> dropped
    r = _one(spark, "<p>alpha beta gamma delta epsilon zeta</p>")
    assert r["n_content_blocks"] == 0
    # 1/6 stopwords = 16.7% < 18% -> still dropped
    r = _one(spark, "<p>the alpha beta gamma delta epsilon</p>")
    assert r["n_content_blocks"] == 0
    # 2/6 = 33% -> kept
    r = _one(spark, "<p>the alpha beta of gamma delta</p>")
    assert r["n_content_blocks"] == 1


def test_link_density_gate(spark):
    # anchor text dominates the block chars -> dropped despite stopwords
    r = _one(
        spark,
        '<p>the of <a href="/a">a very long anchor text body here</a></p>',
    )
    assert r["n_content_blocks"] == 0
    # short anchor inside long prose -> kept
    r = _one(
        spark,
        '<p>the quick brown fox jumped over the lazy dog and it was '
        'seen by <a href="/a">me</a> on that day</p>',
    )
    assert r["n_content_blocks"] == 1


def test_block_order_preserved(spark):
    r = _one(
        spark,
        "<p>the first of all good sentences is here</p>"
        '<div><a href="/n">Nav Nav Nav</a></div>'
        "<p>the second of all good sentences is here</p>",
    )
    assert r["content_text"] == (
        "the first of all good sentences is here\n"
        "the second of all good sentences is here"
    )


def test_inline_tags_do_not_split_blocks(spark):
    r = _one(
        spark,
        "<p>the word <b>bold</b> and the word <i>italic</i> are in "
        "this one block of text</p>",
    )
    assert r["n_blocks"] == 1 and r["n_content_blocks"] == 1
    assert "bold" in r["content_text"]


def test_plan_zero_shuffle_zero_python(spark):
    pages = synth_boiler_pages(
        spark.createDataFrame(
            [(1, "some words here for the page")],
            "doc_id bigint, text string",
        )
    )
    plan = (
        boilerplate_filter(pages)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
