"""Semantics tests for the Naive-Bayes quality classifier.  The
cross-engine value contract is the `nb_quality_scores` DuckDB oracle
(full training+scoring re-derivation, green at sf0.01 and sf0.1 — where
the shared-vocabulary fixture makes agreement ~chance by construction);
these tests pin the mechanism on corpora where NB can genuinely learn:
hand-computed weights, separation on a separable corpus, unseen-word and
empty-doc handling, and the plan shape.
"""

import math

from pyspark.sql import functions as F

from language_detection_spark.operators.quality_model import (
    MICRO,
    nb_quality_scores,
    seed_labels,
    train_nb_quality,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string, good: boolean")


def test_weights_hand_computed(spark):
    # pos corpus: "alpha alpha", neg corpus: "beta".  V=2.
    rows = [(0, "alpha alpha", True), (1, "beta", False)]
    labeled = seed_labels(_df(spark, rows), seed=F.col("good"))
    model, consts = train_nb_quality(labeled)
    m = {r.word: r.llr_micro for r in model.collect()}
    c = consts.collect()[0]
    # llr(alpha) = ln(3/4) - ln(1/3); llr(beta) = ln(1/4) - ln(2/3)
    assert m["alpha"] == round((math.log(3 / 4) - math.log(1 / 3)) * MICRO)
    assert m["beta"] == round((math.log(1 / 4) - math.log(2 / 3)) * MICRO)
    assert c.unseen_micro == round((math.log(1 / 4) - math.log(1 / 3)) * MICRO)
    assert c.prior_micro == 0  # equal doc priors → ln(1/2)-ln(1/2)


def test_separable_corpus_learns(spark):
    # curated docs use a disjoint vocabulary from crawl docs → the
    # classifier must reproduce the seed exactly on the training set.
    rows = [(i, "journal archive treatise monograph", True) for i in range(10)]
    rows += [(100 + i, "spam clickbait adfarm listicle", False) for i in range(10)]
    out = nb_quality_scores(
        _df(spark, rows), seed=F.col("good")
    ).collect()
    for r in out:
        assert r.predicted_keep == r.label_seed
        assert (r.score_micro > 0) == r.label_seed


def test_unseen_words_and_empty_doc(spark):
    rows = [(0, "alpha alpha", True), (1, "beta", False), (2, "", False)]
    labeled = seed_labels(_df(spark, rows), seed=F.col("good"))
    model, consts = train_nb_quality(labeled)
    c = consts.collect()[0]
    # score an out-of-vocab doc: 2 unseen words → prior + 2·unseen
    from language_detection_spark.operators.quality_model import (
        score_nb_quality,
    )

    probe = seed_labels(
        _df(spark, [(9, "gamma delta", False)]), seed=F.col("good")
    )
    got = {r.doc_id: r for r in
           score_nb_quality(probe, model, consts).collect()}
    assert got[9].score_micro == c.prior_micro + 2 * c.unseen_micro
    # empty doc scores exactly the prior
    scored = {r.doc_id: r for r in
              score_nb_quality(labeled, model, consts).collect()}
    assert scored[2].score_micro == c.prior_micro
    assert scored[2].n_words == 0


def test_default_seed_is_length_gate(spark):
    df = spark.createDataFrame(
        [(0, " ".join(["w"] * 60)), (1, "short text")],
        "doc_id: long, text: string",
    )
    lab = {r.doc_id: r.label_seed for r in seed_labels(df).collect()}
    assert lab[0] and not lab[1]


def test_plan_broadcasts_consts_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, "a b c", i % 2 == 0) for i in range(30)],
        "doc_id: long, text: string, good: boolean",
    )
    plan = (
        nb_quality_scores(df, seed=F.col("good"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
