"""Stupid-backoff word-trigram LM: hand-computed goldens, backoff
ladder coverage, differential vs a local reference implementation, and
plan shape."""

import math
from collections import Counter

import pytest

from language_detection_spark.operators.word_lm import (
    ALPHA,
    BOS,
    MICRO,
    stupid_backoff_scores,
)


def local_stupid_backoff(train_texts, score_texts):
    """Plain-Python arbiter implementing the documented spec."""
    tri, bi, uni = Counter(), Counter(), Counter()
    n_tokens = 0
    for t in train_texts:
        ws = t.split() if t.strip() else []
        p = [BOS, BOS] + ws
        n_tokens += len(ws)
        for i in range(2, len(p)):
            tri[(p[i - 2], p[i - 1], p[i])] += 1
        for i in range(1, len(p)):
            bi[(p[i - 1], p[i])] += 1
        for w in p:
            uni[w] += 1
    out = []
    for t in score_texts:
        ws = t.split() if t.strip() else []
        p = [BOS, BOS] + ws
        total, oov = 0, 0
        for i in range(2, len(p)):
            k3 = (p[i - 2], p[i - 1], p[i])
            k2 = (p[i - 1], p[i])
            if tri[k3] > 0:
                s = math.log(tri[k3] / bi[(p[i - 2], p[i - 1])])
            elif bi[k2] > 0:
                s = math.log(ALPHA) + math.log(bi[k2] / uni[p[i - 1]])
            elif uni[p[i]] > 0:
                s = 2 * math.log(ALPHA) + math.log(uni[p[i]] / n_tokens)
            else:
                s = 2 * math.log(ALPHA) - math.log(n_tokens + 1)
                oov += 1
            total += round(s * MICRO)
        out.append((len(ws), oov, total))
    return out


@pytest.fixture(scope="module")
def lm_result(spark):
    train = [
        "the cat sat on the mat",
        "the cat ran to the mat",
        "a dog sat on a log",
    ]
    score = [
        "the cat sat on the mat",  # all trigrams seen
        "the cat sat on a log",  # trigram + bigram backoff mix
        "mat log dog",  # unigram backoff
        "zebra quagga",  # pure OOV
        "",  # empty
        "the",  # single token
    ]
    tdf = spark.createDataFrame(
        list(enumerate(train)), "doc_id bigint, text string"
    )
    sdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(score)],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in stupid_backoff_scores(sdf, train=tdf).collect()
    }
    return rows, local_stupid_backoff(train, score)


def test_matches_local_arbiter_everywhere(lm_result):
    rows, expected = lm_result
    for i, (n, oov, micro) in enumerate(expected):
        r = rows[100 + i]
        assert (r["n_scored"], r["oov_tokens"], r["lm_logprob_micro"]) == (
            n,
            oov,
            micro,
        ), f"doc {100 + i}"


def test_seen_text_scores_higher_than_oov(lm_result):
    rows, _ = lm_result
    seen, oov = rows[100], rows[103]
    assert seen["lm_logprob_micro"] / max(seen["n_scored"], 1) > (
        oov["lm_logprob_micro"] / max(oov["n_scored"], 1)
    )
    assert oov["oov_tokens"] == 2


def test_empty_and_single_token_edges(lm_result):
    rows, _ = lm_result
    assert rows[104]["n_scored"] == 0
    assert rows[104]["lm_logprob_micro"] == 0
    assert rows[105]["n_scored"] == 1


def test_in_corpus_default_train(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b a b")], "doc_id bigint, text string"
    )
    rows = stupid_backoff_scores(df).collect()
    # both docs identical and trained-on: identical scores
    assert rows[0]["lm_logprob_micro"] == rows[1]["lm_logprob_micro"]
    assert all(r["oov_tokens"] == 0 for r in rows)


def test_plan_no_driver_collect_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 5}") for i in range(200)],
        "doc_id bigint, text string",
    )
    out = stupid_backoff_scores(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # consts is the only BroadcastNestedLoopJoin (1-row cross join)
    assert plan.count("BroadcastNestedLoopJoin") <= 1
