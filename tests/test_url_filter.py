"""URL filtering (RefinedWeb-style): hand-computed rule goldens + plan
shape."""

import pytest

from language_detection_spark.operators.url_filter import (
    synth_blocklist,
    synth_crawl_urls,
    url_filter,
)




@pytest.fixture(scope="module")
def filtered(spark):  # noqa: F811
    urls = [
        (0, "https://www.news-3.com/articles/politics"),
        (1, "https://m.clickfarm.net/docs/1"),
        (2, "https://casino-7.org/poker/review"),
        (3, "https://blog-2.com/assets/logo.PNG"),
        (4, "https://shop-1.net/items?q=dating-pharmacy"),
        (5, "https://spam-mill.com/articles/9"),
        (6, "https://forum-4.org/xxx/gallery"),
        (7, "not a url at all"),
    ]
    df = spark.createDataFrame(urls, "doc_id bigint, url string")
    rows = url_filter(df, blocklist=synth_blocklist(spark)).collect()
    return {r["doc_id"]: r for r in rows}


def test_clean_url_kept(filtered):
    r = filtered[0]
    assert r["host"] == "www.news-3.com"
    assert r["registered_domain"] == "news-3.com"
    assert not r["blocked_domain"] and not r["resource_url"]
    assert r["url_score_milli"] == 0 and r["keep_url"]


def test_subdomain_of_blocked_domain_is_blocked(filtered):
    r = filtered[1]
    assert r["registered_domain"] == "clickfarm.net"
    assert r["blocked_domain"] and not r["keep_url"]


def test_soft_words_accumulate(filtered):
    # casino (host) + poker (path) = 1000 -> at threshold, dropped
    r = filtered[2]
    assert r["url_score_milli"] == 1000 and not r["keep_url"]
    # dating + pharmacy (query) = 660 -> under threshold, kept
    r4 = filtered[4]
    assert r4["url_score_milli"] == 660 and r4["keep_url"]


def test_resource_extension_case_insensitive(filtered):
    r = filtered[3]
    assert r["resource_url"] and not r["keep_url"]
    assert r["url_score_milli"] == 0


def test_blocked_domain_with_clean_content_still_dropped(filtered):
    r = filtered[5]
    assert r["blocked_domain"] and not r["keep_url"]
    assert r["url_score_milli"] == 0


def test_hard_word_alone_drops(filtered):
    r = filtered[6]
    assert r["url_score_milli"] == 1000 and not r["keep_url"]


def test_unparseable_url_scores_but_does_not_crash(filtered):
    r = filtered[7]
    assert r["host"] == "" and r["registered_domain"] == ""
    assert not r["blocked_domain"] and r["keep_url"]


def test_no_blocklist_means_scoring_only(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(1, "https://spam-mill.com/a")], "doc_id bigint, url string"
    )
    (r,) = url_filter(df, blocklist=None).collect()
    assert not r["blocked_domain"] and r["keep_url"]


def test_plan_broadcasts_blocklist_no_fact_shuffle(spark):  # noqa: F811
    urls = synth_crawl_urls(
        spark.range(1000).withColumnRenamed("id", "doc_id")
    )
    out = url_filter(urls, blocklist=synth_blocklist(spark))
    # no explicit broadcast hint anymore (a UT1-scale blocklist must be
    # allowed to fall back to a shuffle join): AQE picks the strategy at
    # runtime, so execute first and read the FINAL adaptive plan
    out.collect()  # materialize so AQE finalizes this QueryExecution
    plan = out._jdf.queryExecution().executedPlan().toString()
    # adaptive printout appends the pre-AQE "Initial Plan" — judge the
    # final plan only
    plan = plan.split("Initial Plan")[0]
    # the join itself must be broadcast (fact side unshuffled); the only
    # hash exchange in the plan is the tiny dim's dedup.  (String-order
    # heuristics on the fact/dim sides don't survive AQE's printout, so
    # assert join strategy directly.)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_synth_urls_cover_every_rule(spark):  # noqa: F811
    urls = synth_crawl_urls(
        spark.range(2310).withColumnRenamed("id", "doc_id")
    )
    agg = url_filter(urls, blocklist=synth_blocklist(spark)).groupBy().agg(
        *[
            __import__("pyspark.sql.functions", fromlist=["F"]).sum(
                __import__("pyspark.sql.functions", fromlist=["F"])
                .col(c)
                .cast("int")
            ).alias(c)
            for c in ("blocked_domain", "resource_url", "keep_url")
        ]
    )
    (r,) = agg.collect()
    assert 0 < r["blocked_domain"] < 2310
    assert 0 < r["resource_url"] < 2310
    assert 0 < r["keep_url"] < 2310


def test_page_directives_variants(spark):  # noqa: F811
    from language_detection_spark.operators.url_filter import (
        page_directives,
        synth_directive_pages,
    )

    pages = synth_directive_pages(
        spark.range(15).withColumnRenamed("id", "doc_id")
    )
    rows = {r["doc_id"]: r for r in page_directives(pages).collect()}
    assert not rows[0]["noindex"] and rows[0]["keep_page"]
    assert not rows[1]["noindex"]  # index,follow
    assert rows[2]["noindex"] and not rows[2]["keep_page"]  # NOINDEX upper
    assert rows[3]["nofollow"] and rows[3]["keep_page"]
    # swapped attribute order still parsed
    assert rows[4]["noindex"] and rows[4]["nofollow"]
    # canonical: absent -> self; matching -> self; elsewhere -> not self
    assert rows[0]["canonical_self"] and rows[0]["canonical_href"] == ""
    assert rows[1]["canonical_self"]
    assert rows[1]["canonical_href"].endswith("/page/1")
    # doc 5's canonical target (5 % 7) coincides with its own slot -> self
    assert rows[5]["canonical_self"]
    # doc 8 points at page/1 while living at page/8 -> declared duplicate
    assert not rows[8]["canonical_self"]
    assert rows[8]["canonical_href"].endswith("/page/1")
