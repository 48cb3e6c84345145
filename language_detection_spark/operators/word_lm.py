"""Distributed word-trigram language model with stupid-backoff scoring.

Public technique: "stupid backoff" (Brants et al. 2007, "Large Language
Models in Machine Translation") — the count-based LM score used at
web corpus scale precisely because it needs NO discounting statistics,
so the whole model is three count tables produced by partial-agg
groupBys.  CCNet (Wenzek et al. 2020) made LM scoring the canonical
web-text quality signal; this operator is the distributed, exactly
re-derivable counterpart of that stage (the char-trigram variant lives
in :mod:`.perplexity`; this one is word-level and trains on an
in-corpus reference split, no external model artifact).

    S(w_i | w_{i-2} w_{i-1}) =
        c(w_{i-2} w_{i-1} w_i) / c(w_{i-2} w_{i-1})      if trigram seen
        0.4 * c(w_{i-1} w_i) / c(w_{i-1})                 elif bigram seen
        0.4^2 * c(w_i) / N                                elif unigram seen
        0.4^2 / (N + 1)                                   else (OOV floor)

Streams are padded with two ``<s>`` markers so every real token is
scored with full left context; N counts real (non-marker) training
tokens.

Reference anchor: per-token additive log evidence with backoff mirrors
the reference detector's word-probability update loop
(`Detector.java:220`) one level up, and the train/score split mirrors
its profile-vs-input separation (`DetectorFactory` profiles vs appended
text).

Cross-engine exactness discipline (same as quality_model.py): each
scored position's log-score is quantized to INTEGER micro-units
``round(ln(S)·10^6)`` BEFORE the per-document summation, so document
scores are exact BIGINT sums with no float-association drift.

Scale shape (100 TB): counting is explode + partial-agg groupBy (the
T1 trainer shape); scoring is the token stream joined against the
three count tables keyed by gram strings — Catalyst broadcasts small
models and shuffle-joins web-scale ones (gram keys are Zipf-skewed but
the join is build-side-hashed, not grouped, so skew lands on the
probe side which AQE splits); one partial-agg groupBy per document
closes it.  Nothing data-scale reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
BOS = "<s>"
#: Brants et al.'s fixed backoff multiplier.
ALPHA = 0.4


def _padded(text: Column) -> Column:
    words = F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), r"\s+"))
    return F.concat(F.array(F.lit(BOS), F.lit(BOS)), words)


def _positions(df: DataFrame, text_col: str) -> DataFrame:
    """One row per trigram position i in 3..len(padded): (doc_id, w1,
    w2, w3) with w3 the predicted (real) token.  Every real token of
    every document is scored exactly once."""
    w = _padded(F.col(text_col))
    n = F.size(w)
    idx = F.when(n >= 3, F.sequence(F.lit(3), n)).otherwise(
        F.array().cast("array<int>")
    )
    gram = F.explode(
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(w, i - 2).alias("w1"),
                F.element_at(w, i - 1).alias("w2"),
                F.element_at(w, i).alias("w3"),
            ),
        )
    )
    return df.select(F.col("doc_id"), gram.alias("g")).select(
        "doc_id", "g.w1", "g.w2", "g.w3"
    )


def train_word_lm(train: DataFrame, text_col: str = "text"):
    """Count tables from the training split: ``(tri, bi, uni, consts)``.

    All three derive from ONE trigram-position pass: bigram position
    i's pair (w_{i-1}, w_i) is trigram position i's (w2, w3) for
    i >= 3, and position 2's pair is the constant (BOS, BOS) — one per
    document; likewise the unigram stream is trigram w3 (every real
    token) plus two BOS per document.  tri — (w1, w2, w3, c3); bi —
    (w1, w2, c2), serving both as the trigram-context denominator and
    the backoff-bigram numerator; uni — (w, c1), whose BOS row serves
    as a bigram-context denominator; consts — 1 row (n_tokens BIGINT)
    counting real training tokens.
    """
    pos = _positions(train, text_col)
    tri = pos.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("bigint").alias("c3")
    )
    bos_rows = train.select(
        F.lit(BOS).alias("w1"), F.lit(BOS).alias("w2")
    )
    bi = (
        pos.select(F.col("w2").alias("w1"), F.col("w3").alias("w2"))
        .unionAll(bos_rows)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    )
    uni = (
        pos.select(F.col("w3").alias("w"))
        .unionAll(train.select(F.explode(F.array(F.lit(BOS), F.lit(BOS))).alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    consts = uni.agg(
        F.sum(F.when(F.col("w") == BOS, 0).otherwise(F.col("c1")))
        .cast("bigint")
        .alias("n_tokens")
    )
    return tri, bi, uni, consts


def stupid_backoff_scores(
    df: DataFrame,
    train: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document of ``df`` against an LM trained on
    ``train`` (default: ``df`` itself — in-corpus scoring).

    Output: ``(doc_id, n_scored, oov_tokens, lm_logprob_micro)`` —
    n_scored real tokens, how many fell through to the OOV floor, and
    the exact BIGINT sum of micro-quantized per-token log scores
    (higher = more fluent under the reference split).
    """
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    tri, bi, uni, consts = train_word_lm(
        base if train is None else train.select(
            F.col(id_col).alias("doc_id"), F.col(text_col)
        ),
        text_col,
    )
    pos = _positions(base, text_col)
    j = (
        pos.join(tri, ["w1", "w2", "w3"], "left")
        .join(
            bi.select(
                F.col("w1").alias("cw1"),
                F.col("w2").alias("cw2"),
                F.col("c2").alias("c2_ctx"),
            ),
            (F.col("w1") == F.col("cw1")) & (F.col("w2") == F.col("cw2")),
            "left",
        )
        .join(
            bi.select(
                F.col("w1").alias("bw1"),
                F.col("w2").alias("bw2"),
                F.col("c2").alias("c2_end"),
            ),
            (F.col("w2") == F.col("bw1")) & (F.col("w3") == F.col("bw2")),
            "left",
        )
        .join(
            uni.select(F.col("w").alias("uw2"), F.col("c1").alias("c1_ctx")),
            F.col("w2") == F.col("uw2"),
            "left",
        )
        .join(
            uni.select(F.col("w").alias("uw3"), F.col("c1").alias("c1_end")),
            F.col("w3") == F.col("uw3"),
            "left",
        )
        .crossJoin(F.broadcast(consts))
    )
    ln_a = F.log(F.lit(ALPHA))
    score = (
        F.when(
            F.col("c3").isNotNull(),
            F.log(F.col("c3") / F.col("c2_ctx")),
        )
        .when(
            F.col("c2_end").isNotNull(),
            ln_a + F.log(F.col("c2_end") / F.col("c1_ctx")),
        )
        .when(
            F.col("c1_end").isNotNull(),
            2 * ln_a + F.log(F.col("c1_end") / F.col("n_tokens")),
        )
        .otherwise(2 * ln_a - F.log(F.col("n_tokens") + 1))
    )
    per_pos = j.select(
        "doc_id",
        F.round(score * MICRO).cast("bigint").alias("micro"),
        F.col("c1_end").isNull().cast("int").alias("oov"),
    )
    agg = per_pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.sum("oov").cast("bigint").alias("oov_tokens"),
        F.sum("micro").cast("bigint").alias("lm_logprob_micro"),
    )
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_scored", F.lit(0)).cast("bigint").alias("n_scored"),
            F.coalesce("oov_tokens", F.lit(0))
            .cast("bigint")
            .alias("oov_tokens"),
            F.coalesce("lm_logprob_micro", F.lit(0))
            .cast("bigint")
            .alias("lm_logprob_micro"),
        )
    )
