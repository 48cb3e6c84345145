"""Text-analysis columns for training-data pipelines: token counting,
document fingerprinting, quality scoring, and a SQL-expressible stopword
language heuristic.  Everything here is pure ``pyspark.sql.functions``
expressions (whole-stage codegen; no UDFs), deliberately chosen so an
independent SQL engine can reproduce each value exactly (the DuckDB
correctness oracle)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import md5_int

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
TOKEN_PAT = r"[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-z0-9À-ÿ\s]"


def whitespace_token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PAT), 0))


_FP_MOD = 1152921504606846883  # largest prime < 2^60


def fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: sum over word positions of
    md5_int(i ':' word), mod a 60-bit prime.  Position-salted hashing makes
    it order-sensitive while staying commutative to aggregate — one pass,
    reproducible in any engine with md5."""
    words = F.split(F.trim(text), r"\s+")
    hashed = F.transform(
        F.sequence(F.lit(1), F.size(words)),
        lambda i: F.pmod(
            md5_int(F.concat(i.cast("string"), F.lit(":"), F.element_at(words, i))),
            F.lit(_FP_MOD),
        ),
    )
    return F.pmod(
        F.aggregate(hashed, F.lit(0).cast("bigint"), lambda acc, h: F.pmod(acc + h, F.lit(_FP_MOD))),
        F.lit(_FP_MOD),
    )


def quality_score(text: Column) -> Column:
    """[0,1] heuristic quality score: product of saturating sub-scores for
    length, alpha fraction and mean word length (C4/Gopher-flavored)."""
    words = F.split(F.trim(text), r"\s+")
    n_words = whitespace_token_count(text)
    non_ws = F.length(F.regexp_replace(text, r"\s", ""))
    mean_wl = F.when(n_words > 0, non_ws / n_words).otherwise(F.lit(0.0))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-zÀ-ÿ]")))
    alpha_frac = F.when(n_words > 0, alpha_words / n_words).otherwise(F.lit(0.0))
    len_score = F.least(n_words / F.lit(50.0), F.lit(1.0))
    wl_score = F.when(
        (mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round(len_score * wl_score * alpha_frac, 6)


_STOPWORD_LANGS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "that", "have", "with"),
    "fr": ("le", "la", "les", "est", "et"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "es", "y", "las"),
}


def stopword_langid(text: Column) -> Column:
    """SQL-expressible stopword language vote: the language with the most
    stopword hits wins (ties broken by language order, 'und' = none).
    This is the oracle-checkable baseline detector; the NB detector is the
    real one."""
    t = F.lower(text)
    scores = {
        lang: sum(
            (F.regexp_count(t, F.lit(rf"\b{w}\b")) for w in ws),
            start=F.lit(0),
        )
        for lang, ws in _STOPWORD_LANGS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    # forward order with strict > ⇒ the FIRST language reaching the maximum
    # wins (same as the SQL CASE the oracle uses)
    for lang in _STOPWORD_LANGS:
        best = F.when(scores[lang] > best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, scores[lang])
    return best
