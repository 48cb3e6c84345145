"""Model-based quality filtering: a multinomial Naive Bayes log-odds
classifier over word tokens, bootstrapped from heuristic seed labels.

Public technique: GPT-3 (Brown et al. 2020, Appendix A) filtered
CommonCrawl with a quality classifier trained on a curated positive
seed; CCNet (Wenzek et al. 2020) ranks by a wiki-vs-crawl model.  The
deterministic classical variant of that step is multinomial NB with
Laplace smoothing — count-based, so a second engine can re-derive every
weight exactly.

Reference anchor: the NB scoring loop mirrors the reference detector's
log-probability accumulation (`Detector.java:220` wordProbToDouble
update loop) one level up — per-token additive log evidence with
smoothing, argmax over classes.

Cross-engine exactness discipline (same as tfidf_top_terms): every
log-weight is quantized to an INTEGER micro-unit ``round(llr·10^6)``
before any per-document summation, so scores are exact BIGINT sums —
no float-association drift between engines.

Scale shape (100 TB): token counts are one explode + partial-agg
groupBy (map-side combine); the model is a (word, llr_micro) table
joined term-keyed back to the token stream — left to Catalyst/AQE,
which broadcasts small vocabularies and shuffle-joins web-scale ones;
the three scalar totals ride a 1-row broadcast.  Scoring is one
partial-agg groupBy per document.  Nothing data-scale reaches the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def seed_labels(
    df: DataFrame,
    seed=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 1000,
) -> DataFrame:
    """Bootstrap labels.  ``seed`` is any boolean Column (e.g. a
    curated-source membership, the GPT-3 shape: positive = curated
    corpus, negative = raw crawl); default is a Gopher-style length
    gate.  The classifier's value is generalizing the seed; the
    contract's value is the exact math."""
    if seed is None:
        n = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        seed = (n >= min_words) & (n <= max_words)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        seed.alias("label_seed"),
    )


def train_nb_quality(labeled: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB on ``(doc_id, text, label_seed)``.

    Returns ``(model, consts)``:
      * model — (word, llr_micro BIGINT): per-word log-likelihood ratio
        ``ln((n_pos+1)/(total_pos+V)) − ln((n_neg+1)/(total_neg+V))``
        (Laplace smoothing, V = joint vocabulary size), micro-quantized.
      * consts — 1 row (unseen_micro, prior_micro): the weight of a word
        absent from the vocabulary and the class-prior log-odds.
    """
    toks = labeled.select(
        "doc_id",
        "label_seed",
        F.explode(
            F.when(
                F.length(F.trim(F.col("text"))) == 0,
                F.array().cast("array<string>"),
            ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("word"),
    )
    counts = toks.groupBy("word").agg(
        F.sum(F.when(F.col("label_seed"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("label_seed"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_neg"),
    )
    totals = counts.agg(
        F.sum("n_pos").cast("bigint").alias("total_pos"),
        F.sum("n_neg").cast("bigint").alias("total_neg"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    docs = labeled.agg(
        F.sum(F.when(F.col("label_seed"), 1).otherwise(0))
        .cast("bigint")
        .alias("docs_pos"),
        F.count(F.lit(1)).cast("bigint").alias("docs_all"),
    )
    model = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "word",
            F.round(
                (
                    F.log(
                        (F.col("n_pos") + 1)
                        / (F.col("total_pos") + F.col("vocab"))
                    )
                    - F.log(
                        (F.col("n_neg") + 1)
                        / (F.col("total_neg") + F.col("vocab"))
                    )
                )
                * MICRO
            )
            .cast("bigint")
            .alias("llr_micro"),
        )
    )
    consts = (
        totals.crossJoin(docs)
        .select(
            F.round(
                (
                    F.log(
                        F.lit(1.0) / (F.col("total_pos") + F.col("vocab"))
                    )
                    - F.log(
                        F.lit(1.0) / (F.col("total_neg") + F.col("vocab"))
                    )
                )
                * MICRO
            )
            .cast("bigint")
            .alias("unseen_micro"),
            F.round(
                (
                    F.log(F.col("docs_pos") / F.col("docs_all"))
                    - F.log(
                        (F.col("docs_all") - F.col("docs_pos"))
                        / F.col("docs_all")
                    )
                )
                * MICRO
            )
            .cast("bigint")
            .alias("prior_micro"),
        )
    )
    return model, consts


def score_nb_quality(
    labeled: DataFrame, model: DataFrame, consts: DataFrame
) -> DataFrame:
    """Score every document: ``score_micro = prior + Σ_token llr(word)``
    (unseen words take the unseen weight), ``predicted_keep = score > 0``.
    Output: (doc_id, label_seed, n_words, score_micro, predicted_keep).
    """
    toks = labeled.select(
        "doc_id",
        F.explode(
            F.when(
                F.length(F.trim(F.col("text"))) == 0,
                F.array().cast("array<string>"),
            ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("word"),
    )
    scored = (
        toks.join(model, "word", "left")
        .crossJoin(F.broadcast(consts))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            (
                F.sum(F.coalesce("llr_micro", F.col("unseen_micro")))
                + F.first("prior_micro")
            )
            .cast("bigint")
            .alias("score_micro"),
        )
    )
    base = labeled.select("doc_id", "label_seed")
    prior_only = consts.select(
        F.col("prior_micro").alias("_prior")
    )
    return (
        base.join(scored, "doc_id", "left")
        .crossJoin(F.broadcast(prior_only))
        .select(
            "doc_id",
            "label_seed",
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("score_micro", F.col("_prior"))
            .cast("bigint")
            .alias("score_micro"),
            (
                F.coalesce("score_micro", F.col("_prior")) > 0
            ).alias("predicted_keep"),
        )
    )


def nb_quality_scores(
    df: DataFrame,
    seed=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 1000,
) -> DataFrame:
    """Train-and-score in one call (the contract query surface)."""
    labeled = seed_labels(df, seed, id_col, text_col, min_words, max_words)
    model, consts = train_nb_quality(labeled)
    return score_nb_quality(labeled, model, consts)
