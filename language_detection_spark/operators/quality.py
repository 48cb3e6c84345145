"""Quality-filter rules and PII/toxicity scrubbing (SURVEY.md §2.7 Q1-Q5).

All heuristic rules are pure ``pyspark.sql.functions`` column expressions —
they stay inside whole-stage codegen, shuffle nothing, and are individually
named boolean "violation" columns (``rule_*``) so every drop decision is
auditable.  Thresholds follow the published Gopher (Rae et al. 2021,
arXiv:2112.11446) and C4 (Raffel et al. 2020) heuristics.

Q1 generalizes the reference's Nutch lang filter + PROB_THRESHOLD
(Detector.java:74, LanguageDetectionFilter.java:55-71): keep iff top-1
language is allowlisted with confidence >= lang_conf_min.

The PII scrub is the same operator class as the reference's URL/mail
removal (Detector.java:79-80, applied :216-217) with placeholder tokens
instead of deletion; deterministic order: email → ip → phone → url.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class QualityConfig:
    lang_allow: tuple[str, ...] = ("en",)
    lang_conf_min: float = 0.5
    min_words: int = 50
    max_words: int = 100_000
    mean_word_len_min: float = 3.0
    mean_word_len_max: float = 10.0
    symbol_word_ratio_max: float = 0.1
    bullet_line_frac_max: float = 0.9
    ellipsis_line_frac_max: float = 0.3
    min_stopword_hits: int = 2
    dup_line_frac_max: float = 0.3
    alpha_word_frac_min: float = 0.8
    max_ppl: float | None = 5000.0
    tox_max_hits: int = 1
    stopwords: tuple[str, ...] = (
        "the", "be", "to", "of", "and", "that", "have", "with",
    )
    toxicity_terms: tuple[str, ...] = (
        # small demonstrative blocklist; deployments supply their own
        "badword1", "badword2", "slur1", "slur2",
    )


# --- PII patterns (placeholder-token scrub, Q4) ----------------------------
EMAIL_PAT = r"[-_.0-9A-Za-z]{1,64}@[-_0-9A-Za-z]{1,255}[-_.0-9A-Za-z]{1,255}"
IP_PAT = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_PAT = r"\+?\d[\d\s().-]{7,}\d"
URL_PAT = r"https?://[-_.?&~;+=/#0-9A-Za-z]{1,2076}"


def scrub_pii(col: Column) -> Column:
    c = F.regexp_replace(col, EMAIL_PAT, "<EMAIL>")
    c = F.regexp_replace(c, IP_PAT, "<IP>")
    c = F.regexp_replace(c, PHONE_PAT, "<PHONE>")
    c = F.regexp_replace(c, URL_PAT, "<URL>")
    return c


def toxicity_pattern(cfg: QualityConfig) -> str:
    return r"(?i)\b(?:" + "|".join(cfg.toxicity_terms) + r")\b"


def scrub_toxicity(col: Column, cfg: QualityConfig) -> Column:
    return F.regexp_replace(col, toxicity_pattern(cfg), "<TOX>")


# --- document statistics (pure expressions; no UDF) ------------------------

def words_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def stat_columns(text: Column) -> dict[str, Column]:
    words = words_col(text)
    n_words = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(words))
    lines = F.split(text, r"\n")
    n_lines = F.size(lines)
    n_chars = F.length(text)
    non_ws_chars = F.length(F.regexp_replace(text, r"\s", ""))
    mean_word_len = F.when(n_words > 0, non_ws_chars / n_words)
    symbol_hits = F.regexp_count(text, F.lit(r"#|\.\.\.|…"))
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([*•‣▪-])"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
    )
    dup_line_frac = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)) / n_lines,
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-zÀ-ÿ]")))
    alpha_word_frac = F.when(n_words > 0, alpha_words / n_words)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_lines": n_lines,
        "mean_word_len": mean_word_len,
        "symbol_word_ratio": F.when(n_words > 0, symbol_hits / n_words),
        "bullet_line_frac": F.when(n_lines > 0, bullet_lines / n_lines),
        "ellipsis_line_frac": F.when(n_lines > 0, ellipsis_lines / n_lines),
        "dup_line_frac": dup_line_frac,
        "alpha_word_frac": alpha_word_frac,
    }


def stopword_hits(text: Column, cfg: QualityConfig) -> Column:
    pat = r"(?i)\b(?:" + "|".join(cfg.stopwords) + r")\b"
    return F.regexp_count(text, F.lit(pat))


def rule_columns(df: DataFrame, cfg: QualityConfig,
                 text_col: str = "text") -> DataFrame:
    """Attach stat_* and rule_* columns.  Each rule_* is TRUE when the
    document VIOLATES that rule."""
    text = F.col(text_col)
    stats = stat_columns(text)
    for name, col in stats.items():
        df = df.withColumn(f"stat_{name}", col)
    df = df.withColumn("stat_stopword_hits", stopword_hits(text, cfg))
    df = df.withColumn(
        "stat_tox_hits", F.regexp_count(text, F.lit(toxicity_pattern(cfg)))
    )
    s = lambda n: F.col(f"stat_{n}")  # noqa: E731
    rules = {
        "rule_too_few_words": s("n_words") < cfg.min_words,
        "rule_too_many_words": s("n_words") > cfg.max_words,
        "rule_mean_word_len": ~s("mean_word_len").between(
            cfg.mean_word_len_min, cfg.mean_word_len_max
        ),
        "rule_symbol_ratio": s("symbol_word_ratio") > cfg.symbol_word_ratio_max,
        "rule_bullet_lines": s("bullet_line_frac") > cfg.bullet_line_frac_max,
        "rule_ellipsis_lines": s("ellipsis_line_frac") > cfg.ellipsis_line_frac_max,
        "rule_few_stopwords": s("stopword_hits") < cfg.min_stopword_hits,
        "rule_dup_lines": s("dup_line_frac") > cfg.dup_line_frac_max,
        "rule_alpha_words": s("alpha_word_frac") < cfg.alpha_word_frac_min,
        "rule_lorem_ipsum": F.lower(text).contains("lorem ipsum"),
        "rule_curly_brace": text.contains("{"),
        "rule_toxicity": s("tox_hits") > cfg.tox_max_hits,
    }
    for name, col in rules.items():
        df = df.withColumn(name, F.coalesce(col, F.lit(True)))
    return df


def lang_rule(df: DataFrame, cfg: QualityConfig) -> DataFrame:
    """Q1: language keep/drop from the detector's output columns."""
    viol = ~(
        F.col("lang").isin(*cfg.lang_allow)
        & (F.col("lang_conf") >= cfg.lang_conf_min)
    )
    df = df.withColumn("rule_language", F.coalesce(viol, F.lit(True)))
    if cfg.max_ppl is not None and "ppl" in df.columns:
        df = df.withColumn(
            "rule_perplexity",
            F.coalesce(F.col("ppl") > cfg.max_ppl, F.lit(True)),
        )
    return df


def keep_column(df: DataFrame) -> Column:
    rule_cols = [c for c in df.columns if c.startswith("rule_")]
    keep = F.lit(True)
    for c in rule_cols:
        keep = keep & ~F.col(c)
    return keep
