"""Hand-computed goldens for the Gopher repetition signals and source
aggregation (Rae et al. 2021 Table A1 family)."""

import pytest

from language_detection_spark.operators.text_analysis import (
    ngram_repetition_stats,
    source_stats,
)


@pytest.fixture()
def rep_docs(spark):
    rows = [
        # top 2-gram "a b" x2, mass 2*2=4, total 5 -> 0.8; one 5-gram -> dup 0
        (0, "a b a b c"),
        # 6-word phrase repeated: every 2-gram except "u p" occurs twice,
        # max mass 2*2=4 over total 12 -> 0.333333; dup-5-gram mass
        # 2*5+2*5=20 over 12 -> capped 1.0
        (1, "p q r s t u p q r s t u"),
        # single 2-gram covers the whole doc (cnt=1, mass 10/10) -> 1.0;
        # fewer than 5 words -> dup5 0.0
        (2, "hello world"),
        # no 2-grams at all
        (3, "x"),
        # overlap case: two overlapping "a a", mass 4 over total 3 -> cap 1.0
        (4, "a a a"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_goldens(spark, rep_docs):
    got = {
        r["doc_id"]: (r["top2gram_char_frac"], r["dup5gram_char_frac"])
        for r in ngram_repetition_stats(rep_docs).collect()
    }
    assert got[0] == (0.8, 0.0)
    assert got[1] == (0.333333, 1.0)
    assert got[2] == (1.0, 0.0)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (1.0, 0.0)


def test_source_stats(spark):
    rows = [
        (0, "one two three", "en", "site-a"),
        (1, "vier funf sechs", "de", "site-a"),
        (2, "sept huit", "fr", "site-b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r["source"]: r.asDict() for r in source_stats(df).collect()}
    assert got["site-a"]["n_docs"] == 2
    assert got["site-a"]["n_langs"] == 2
    assert got["site-b"]["n_docs"] == 1
    assert got["site-b"]["n_langs"] == 1
    assert got["site-a"]["mean_chars"] == (13 + 15) / 2
