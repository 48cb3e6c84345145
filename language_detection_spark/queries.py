"""Named query registry — the driver-contract surface (__spark_entry__).

Each entry maps an operator from SURVEY.md §2 (or a training-pipeline
extra) to a (spark, sf_dir) → DataFrame callable, with an ANSI-SQL oracle
runnable by DuckDB on the same parquet where the semantics are
SQL-expressible.  Column names/aliases are kept identical on both sides
(the driver's comparison sorts columns by name and hashes values).

Non-SQL-expressible operators (the sampling detector, gram trainer, LSH
over python hashing, multimodal) register with ``oracle=None`` → the
driver records a rows-only check; their real correctness gates live in
tests/ (golden + property tests).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


_REGISTRY: dict[str, dict] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY[name] = {"fn": fn, "oracle": oracle}
        return fn

    return deco


def queries():
    return {name: entry["fn"] for name, entry in _REGISTRY.items()}


def oracle_sql():
    return {
        name: entry["oracle"]
        for name, entry in _REGISTRY.items()
        if entry["oracle"] is not None
    }


# ---------------------------------------------------------------------------
# SQL-checkable queries
# ---------------------------------------------------------------------------

# Q3 doc stats (quality.stat_columns semantics, per document)
_DOC_STATS_SQL = """
SELECT
  doc_id,
  length(text) AS n_chars_m,
  CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
  CASE WHEN length(trim(text)) = 0 THEN NULL
       ELSE round(length(regexp_replace(text, '\\s', '', 'g')) * 1.0 /
            len(string_split_regex(trim(text), '\\s+')), 6) END AS mean_word_len,
  len(regexp_extract_all(lower(text), '\\bthe\\b')) AS the_hits
FROM documents
"""


@register("doc_stats", _DOC_STATS_SQL)
def q_doc_stats(spark, sf_dir):
    from .operators.quality import stat_columns

    docs = _docs(spark, sf_dir)
    stats = stat_columns(F.col("text"))
    return docs.select(
        "doc_id",
        stats["n_chars"].alias("n_chars_m"),
        stats["n_words"].alias("n_words"),
        F.round(stats["mean_word_len"], 6).alias("mean_word_len"),
        F.regexp_count(F.lower(F.col("text")), F.lit(r"\bthe\b")).alias("the_hits"),
    )


# Q3/Q1 rule summary: violation counts across the corpus
_RULE_SUMMARY_SQL = """
WITH s AS (
  SELECT
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
    CASE WHEN length(trim(text)) = 0 THEN NULL
         ELSE length(regexp_replace(text, '\\s', '', 'g')) * 1.0 /
              len(string_split_regex(trim(text), '\\s+')) END AS mwl,
    lower(text) LIKE '%lorem ipsum%' AS lorem,
    contains(text, '{') AS curly
  FROM documents
)
SELECT
  count(*) AS n_docs,
  sum(CASE WHEN n_words < 50 THEN 1 ELSE 0 END)::BIGINT AS viol_min_words,
  sum(CASE WHEN n_words > 100000 THEN 1 ELSE 0 END)::BIGINT AS viol_max_words,
  sum(CASE WHEN mwl IS NULL OR mwl < 3.0 OR mwl > 10.0 THEN 1 ELSE 0 END)::BIGINT
    AS viol_mean_word_len,
  sum(CASE WHEN lorem THEN 1 ELSE 0 END)::BIGINT AS viol_lorem,
  sum(CASE WHEN curly THEN 1 ELSE 0 END)::BIGINT AS viol_curly
FROM s
"""


@register("quality_rule_summary", _RULE_SUMMARY_SQL)
def q_rule_summary(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    t = F.col("text")
    words = F.split(F.trim(t), r"\s+")
    n_words = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(words))
    mwl = F.when(
        n_words > 0,
        F.length(F.regexp_replace(t, r"\s", "")) / n_words,
    )
    return docs.select(
        n_words.alias("nw"),
        mwl.alias("mwl"),
        F.lower(t).contains("lorem ipsum").alias("lorem"),
        t.contains("{").alias("curly"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("nw") < 50).cast("long")).alias("viol_min_words"),
        F.sum((F.col("nw") > 100000).cast("long")).alias("viol_max_words"),
        F.sum(
            (F.col("mwl").isNull() | (F.col("mwl") < 3.0) | (F.col("mwl") > 10.0))
            .cast("long")
        ).alias("viol_mean_word_len"),
        F.sum(F.col("lorem").cast("long")).alias("viol_lorem"),
        F.sum(F.col("curly").cast("long")).alias("viol_curly"),
    )


# Q1 language keep/drop on table metadata (filter pushdown demo)
_LANG_KEEP_SQL = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE lang IN ('en', 'de') AND n_chars >= 200
"""


@register("lang_keep_filter", _LANG_KEEP_SQL)
def q_lang_keep(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .filter(F.col("lang").isin("en", "de") & (F.col("n_chars") >= 200))
        .select("doc_id", "lang", "n_chars")
    )


# E1: confusion counts of the SQL-expressible stopword detector vs labels
_STOPWORD_SCORES_SQL_FRAG = """
  SELECT lang, doc_id,
    len(regexp_extract_all(lower(text), '\\bthe\\b')) +
    len(regexp_extract_all(lower(text), '\\band\\b')) +
    len(regexp_extract_all(lower(text), '\\bthat\\b')) +
    len(regexp_extract_all(lower(text), '\\bhave\\b')) +
    len(regexp_extract_all(lower(text), '\\bwith\\b')) AS s_en,
    len(regexp_extract_all(lower(text), '\\ble\\b')) +
    len(regexp_extract_all(lower(text), '\\bla\\b')) +
    len(regexp_extract_all(lower(text), '\\bles\\b')) +
    len(regexp_extract_all(lower(text), '\\best\\b')) +
    len(regexp_extract_all(lower(text), '\\bet\\b')) AS s_fr,
    len(regexp_extract_all(lower(text), '\\bder\\b')) +
    len(regexp_extract_all(lower(text), '\\bdie\\b')) +
    len(regexp_extract_all(lower(text), '\\bdas\\b')) +
    len(regexp_extract_all(lower(text), '\\bund\\b')) +
    len(regexp_extract_all(lower(text), '\\bist\\b')) AS s_de,
    len(regexp_extract_all(lower(text), '\\bel\\b')) +
    len(regexp_extract_all(lower(text), '\\blos\\b')) +
    len(regexp_extract_all(lower(text), '\\bes\\b')) +
    len(regexp_extract_all(lower(text), '\\by\\b')) +
    len(regexp_extract_all(lower(text), '\\blas\\b')) AS s_es
  FROM documents
"""

_STOPWORD_CONFUSION_SQL = f"""
WITH sc AS ({_STOPWORD_SCORES_SQL_FRAG}),
p AS (
  SELECT lang,
    CASE WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
         WHEN s_en = greatest(s_en, s_fr, s_de, s_es) THEN 'en'
         WHEN s_fr = greatest(s_en, s_fr, s_de, s_es) THEN 'fr'
         WHEN s_de = greatest(s_en, s_fr, s_de, s_es) THEN 'de'
         ELSE 'es' END AS pred
  FROM sc
)
SELECT lang, pred, count(*) AS n FROM p GROUP BY lang, pred ORDER BY lang, pred
"""


@register("stopword_confusion", _STOPWORD_CONFUSION_SQL)
def q_stopword_confusion(spark, sf_dir):
    from .operators.eval import confusion_counts
    from .operators.text_analysis import stopword_langid

    docs = _docs(spark, sf_dir).withColumn("pred", stopword_langid(F.col("text")))
    return confusion_counts(docs, "lang", "pred")


# E2: per-language accuracy of the stopword detector
_STOPWORD_ACCURACY_SQL = f"""
WITH sc AS ({_STOPWORD_SCORES_SQL_FRAG}),
p AS (
  SELECT lang,
    CASE WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
         WHEN s_en = greatest(s_en, s_fr, s_de, s_es) THEN 'en'
         WHEN s_fr = greatest(s_en, s_fr, s_de, s_es) THEN 'fr'
         WHEN s_de = greatest(s_en, s_fr, s_de, s_es) THEN 'de'
         ELSE 'es' END AS pred
  FROM sc
)
SELECT lang, count(*) AS n_docs,
       round(avg(CASE WHEN lang = pred THEN 1.0 ELSE 0.0 END), 6) AS accuracy
FROM p GROUP BY lang ORDER BY lang
"""


@register("stopword_accuracy", _STOPWORD_ACCURACY_SQL)
def q_stopword_accuracy(spark, sf_dir):
    from .operators.text_analysis import stopword_langid

    docs = _docs(spark, sf_dir).withColumn("pred", stopword_langid(F.col("text")))
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.avg((F.col("lang") == F.col("pred")).cast("double")), 6
            ).alias("accuracy"),
        )
        .orderBy("lang")
    )


# exact dedup clusters (md5-keyed)
_EXACT_DUP_SQL = """
SELECT text_hash, n_dups, keep_id FROM (
  SELECT ('0x' || substr(md5(text), 1, 15))::BIGINT AS text_hash,
         count(*) AS n_dups, min(doc_id) AS keep_id
  FROM documents GROUP BY 1
) WHERE n_dups > 1
"""


@register("exact_dup_clusters", _EXACT_DUP_SQL)
def q_exact_dup(spark, sf_dir):
    from .operators.dedup import exact_dup_clusters

    return exact_dup_clusters(_docs(spark, sf_dir))


# MinHash signatures (8 perms, word 3-shingles) as scalar columns
def _minhash_sql(num_perm: int = 8, k: int = 3) -> str:
    sig_cols = ",\n  ".join(
        "list_min(list_transform(sh, s -> ('0x' || substr(md5('"
        + f"{p}:' || s), 1, 15))::BIGINT)) AS s{p}"
        for p in range(num_perm)
    )
    return f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
),
sh AS (
  SELECT doc_id,
         [array_to_string(words[i:i+{k - 1}], ' ')
          for i in range(1, len(words) - {k - 2})] AS sh
  FROM w WHERE len(words) >= {k}
)
SELECT doc_id, {sig_cols} FROM sh
"""


@register("minhash_signatures", _minhash_sql())
def q_minhash_sigs(spark, sf_dir):
    from .operators.dedup import minhash_signatures

    sigs = minhash_signatures(_docs(spark, sf_dir), num_perm=8, shingle_k=3)
    return sigs.select(
        F.col("id").alias("doc_id"),
        *[F.col("sig")[p].alias(f"s{p}") for p in range(8)],
    )


# document fingerprints (order-sensitive rolling hash)
_FINGERPRINT_SQL = """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
)
SELECT doc_id,
  (list_sum(list_transform(range(1, len(words) + 1),
    i -> ('0x' || substr(md5(i::VARCHAR || ':' || words[i]), 1, 15))::BIGINT
         % 1152921504606846883))
  % 1152921504606846883)::BIGINT AS fp
FROM w
"""


@register("doc_fingerprints", _FINGERPRINT_SQL)
def q_fingerprints(spark, sf_dir):
    from .operators.text_analysis import fingerprint

    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


# token counts (whitespace + BPE-ish)
_TOKEN_COUNTS_SQL = """
SELECT doc_id,
  CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(string_split_regex(trim(text), '\\s+')) END AS ws_tokens,
  len(regexp_extract_all(text, '[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-z0-9À-ÿ\\s]'))
    AS bpe_tokens
FROM documents
"""


@register("token_counts", _TOKEN_COUNTS_SQL)
def q_token_counts(spark, sf_dir):
    from .operators.text_analysis import bpe_token_count, whitespace_token_count

    return _docs(spark, sf_dir).select(
        "doc_id",
        whitespace_token_count(F.col("text")).alias("ws_tokens"),
        bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


# T1 (SQL-expressible form): token frequency counts per language
_TOKEN_FREQ_SQL = """
SELECT lang, word, count(*) AS n
FROM (
  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS word
  FROM documents WHERE length(trim(text)) > 0
)
GROUP BY lang, word
"""


@register("train_token_counts", _TOKEN_FREQ_SQL)
def q_token_freq(spark, sf_dir):
    docs = _docs(spark, sf_dir).filter(F.length(F.trim("text")) > 0)
    return (
        docs.select(
            "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
        )
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# T3 (SQL-expressible form): trim tokens at threshold max(total/100000, 2)
_TOKEN_TRIM_SQL = """
WITH c AS (
  SELECT lang, word, count(*) AS n
  FROM (
    SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS word
    FROM documents WHERE length(trim(text)) > 0
  ) GROUP BY lang, word
),
tot AS (SELECT lang, sum(n) AS total FROM c GROUP BY lang)
SELECT c.lang AS lang, word, n
FROM c JOIN tot ON c.lang = tot.lang
WHERE n > greatest(tot.total // 100000, 2)
"""


@register("train_token_trim", _TOKEN_TRIM_SQL)
def q_token_trim(spark, sf_dir):
    counts = q_token_freq(spark, sf_dir)
    totals = counts.groupBy("lang").agg(F.sum("n").alias("total"))
    return (
        counts.join(F.broadcast(totals), "lang")
        .filter(
            F.col("n")
            > F.greatest(F.floor(F.col("total") / 100000), F.lit(2)).cast("bigint")
        )
        .select("lang", "word", "n")
    )


# PII scrub (Q4) — reference-regex email + ip/phone placeholders
_PII_SCRUB_SQL = """
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        text || ' contact: user' || doc_id::VARCHAR || '@mail.example ip 10.0.0.' ||
          (doc_id % 255)::VARCHAR,
        '[-_.0-9A-Za-z]{1,64}@[-_0-9A-Za-z]{1,255}[-_.0-9A-Za-z]{1,255}',
        '<EMAIL>', 'g'),
      '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
    '\\+?\\d[\\d\\s().-]{7,}\\d', '<PHONE>', 'g') AS scrubbed
FROM documents
"""


@register("pii_scrub", _PII_SCRUB_SQL)
def q_pii_scrub(spark, sf_dir):
    from .operators.quality import EMAIL_PAT, IP_PAT, PHONE_PAT

    docs = _docs(spark, sf_dir)
    withpii = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example ip 10.0.0."),
        (F.col("doc_id") % 255).cast("string"),
    )
    c = F.regexp_replace(withpii, EMAIL_PAT, "<EMAIL>")
    c = F.regexp_replace(c, IP_PAT, "<IP>")
    c = F.regexp_replace(c, PHONE_PAT, "<PHONE>")
    return docs.select("doc_id", c.alias("scrubbed"))


# similarity: brute-force cosine top-k (first 3 vectors as queries)
_SIM_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3
),
scored AS (
  SELECT q.query_id AS query_id, e.vec_id AS vec_id,
         round(list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]), 4)
           AS sim
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id)
           AS rank
  FROM scored
)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 5
"""


@register("similarity_topk", _SIM_TOPK_SQL)
def q_similarity_topk(spark, sf_dir):
    from .operators.similarity import cosine_sim

    emb = _emb(spark, sf_dir)
    q = F.broadcast(
        emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
    )
    scored = q.crossJoin(emb.select("vec_id", F.col("embedding").alias("v"))).select(
        "query_id",
        "vec_id",
        F.round(
            cosine_sim(
                F.col("qv").cast("array<double>"), F.col("v").cast("array<double>")
            ),
            4,
        ).alias("sim"),
    )
    from .operators.similarity import two_phase_topk

    return two_phase_topk(scored, k=5)


# embedding stats per label
_EMB_STATS_SQL = """
SELECT label, count(*) AS n,
  round(avg(sqrt(list_sum(list_transform(embedding, x -> x * x)))), 6)
    AS avg_norm
FROM embeddings GROUP BY label ORDER BY label
"""


@register("embedding_stats", _EMB_STATS_SQL)
def q_embedding_stats(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg(norm), 6).alias("avg_norm"))
        .orderBy("label")
    )


# streaming-shaped batch agg: hourly event rollup
_EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


@register("events_hourly", _EVENTS_HOURLY_SQL)
def q_events_hourly(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value")
        )
        .orderBy("hour", "event_type")
    )


# relational demo: pricing-summary aggregation over lineitem (TPC-H Q1
# shape — partial+final hash agg, one small shuffle, scan-bound)
_LINEITEM_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("lineitem_pricing_summary", _LINEITEM_SUMMARY_SQL)
def q_lineitem_summary(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# relational demo: orders joined through customer/nation/region (broadcast)
_ORDERS_BY_REGION_SQL = """
SELECT r.r_name AS region, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name ORDER BY region
"""


@register("orders_by_region", _ORDERS_BY_REGION_SQL)
def q_orders_by_region(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = F.broadcast(spark.read.parquet(f"{sf_dir}/customer.parquet"))
    nation = F.broadcast(spark.read.parquet(f"{sf_dir}/nation.parquet"))
    region = F.broadcast(spark.read.parquet(f"{sf_dir}/region.parquet"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# rows-only queries (semantics not expressible in SQL; golden-tested in
# tests/ instead — the driver records the weaker check)
# ---------------------------------------------------------------------------


@register("detect_languages", None)
def q_detect_languages(spark, sf_dir):
    """The real sampling NB detector over documents (I1-I4)."""
    from .models.factory import load_default_model
    from .operators.udfs import make_detect_udf

    model = load_default_model()
    docs = _docs(spark, sf_dir).withColumn(
        "url", F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    )
    det = make_detect_udf(model, spark)("url", "text")
    return docs.withColumn("_d", det).select(
        "doc_id",
        F.col("_d.lang").alias("lang_pred"),
        F.round(F.col("_d.lang_conf"), 6).alias("lang_conf"),
    )


@register("detect_language_counts", None)
def q_detect_language_counts(spark, sf_dir):
    """Aggregated detector output (stable under sampling)."""
    return (
        q_detect_languages(spark, sf_dir)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_pred")
    )


@register("train_gram_counts", None)
def q_train_gram_counts(spark, sf_dir):
    """T1: real char n-gram training counts (normalization is not
    SQL-expressible; parity vs LangProfile.update is golden-tested)."""
    from .models.trainer import gram_counts

    docs = _docs(spark, sf_dir)
    return gram_counts(docs, "text", "lang").orderBy("lang", "gram_key")


@register("fast_langid_counts", None)
def q_fast_langid(spark, sf_dir):
    """I5-I8: single-pass NB classifier label distribution."""
    from .models.factory import load_default_model
    from .operators.fast_langid import FastLangID

    model = load_default_model()
    docs = _docs(spark, sf_dir)
    from pyspark.sql.types import StringType

    fast = FastLangID(model)

    @F.pandas_udf(StringType())
    def _cls(texts: pd.Series) -> pd.Series:
        langs, _ = fast.classify_batch(list(texts))
        return pd.Series(langs)

    return (
        docs.withColumn("pred", _cls(F.col("text")))
        .groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("pred")
    )


@register("langid_v3_counts", None)
def q_langid_v3(spark, sf_dir):
    """The reference's second detector (langid.py port) with its REAL
    bundled model — label distribution over documents (I5-I8 with the
    byte-DFA feature extractor F3, batch-vectorized)."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _cls(texts: pd.Series) -> pd.Series:
        from .operators.langid_v3 import LangIdV3

        lid = LangIdV3()
        langs, _ = lid.classify_batch(list(texts))
        return pd.Series(langs)

    return (
        _docs(spark, sf_dir)
        .withColumn("pred", _cls(F.col("text")))
        .groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("pred")
    )


@register("pipeline_keep_drop", None)
def q_pipeline_keep_drop(spark, sf_dir):
    """Full quality-filter pipeline over the synthetic pages table:
    per-rule violation counts + keep count (Q1-Q5 composed)."""
    from .models.factory import load_default_model
    from .operators.pipeline import PipelineOptions, QualityFilterPipeline
    from .operators.quality import QualityConfig
    from .sources.pages import synth_pages_df

    model = load_default_model()
    pages = synth_pages_df(spark, sf_dir)
    pipe = QualityFilterPipeline(
        spark,
        model,
        QualityConfig(lang_allow=("en",), min_stopword_hits=1),
        PipelineOptions(n_buckets=32),
    )
    ann = pipe.annotate(pages)
    rule_cols = sorted(c for c in ann.columns if c.startswith("rule_"))
    return ann.agg(
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col("keep").cast("long")).alias("rows_kept"),
        *[F.sum(F.col(c).cast("long")).alias(f"drop_{c[5:]}") for c in rule_cols],
    )


# SimHash values per document — the python-UDF hash math is reproducible
# in SQL because the token hash is the shared md5-prefix-int
_SIMHASH_VALUES_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
  FROM documents WHERE length(trim(text)) > 0
),
h AS (SELECT doc_id, ('0x'||substr(md5(word),1,15))::BIGINT AS hw FROM w),
b AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (hw >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS score
  FROM h CROSS JOIN (SELECT unnest(range(0,60)) AS bit) bits
  GROUP BY doc_id, bit
)
SELECT doc_id,
       sum(CASE WHEN score > 0 THEN 1::BIGINT << bit ELSE 0::BIGINT END)::BIGINT
         AS simhash
FROM b GROUP BY doc_id
"""


@register("simhash_values", _SIMHASH_VALUES_SQL)
def q_simhash_values(spark, sf_dir):
    from .operators.dedup import simhash_udf

    return (
        _docs(spark, sf_dir)
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", simhash_udf()(F.col("text")).alias("simhash"))
    )


# SimHash near-dup pairs — the oracle is the EXACT all-pairs Hamming ball
# (O(n²) is fine at oracle scale), so it checks the blocking scheme's
# recall, not just the arithmetic: n_tables = max_hamming+1 disjoint
# chunks guarantee every pair within the ball is a candidate (pigeonhole).
_SIMHASH_PAIRS_SQL = f"""
WITH sv AS ({_SIMHASH_VALUES_SQL})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
FROM sv a JOIN sv b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
ORDER BY id_a, id_b
"""


@register("simhash_near_dups", _SIMHASH_PAIRS_SQL)
def q_simhash(spark, sf_dir):
    from .operators.dedup import simhash_near_dup_pairs

    # empty docs hash to 0 and would all pair degenerately; the values
    # oracle excludes them too
    docs = _docs(spark, sf_dir).filter(F.length(F.trim("text")) > 0)
    return simhash_near_dup_pairs(docs, max_hamming=8).orderBy("id_a", "id_b")


# full near-dup pipeline: 16-perm signatures → 4-band LSH buckets →
# exact shingle-set Jaccard ≥ 0.5 — the whole thing is SQL-reproducible
_MINHASH_PAIRS_SQL = """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
),
sh AS (
  SELECT doc_id,
         [array_to_string(words[i:i+2], ' ')
          for i in range(1, len(words) - 1)] AS sh
  FROM w WHERE len(words) >= 3
),
sig AS (
  SELECT doc_id,
         [list_min(list_transform(sh,
            s -> ('0x'||substr(md5(p::VARCHAR||':'||s),1,15))::BIGINT))
          for p in range(0, 16)] AS sig
  FROM sh
),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(range(0,4)) AS b) bands
),
sized AS (SELECT band, band_hash, count(*) AS sz FROM banded GROUP BY 1, 2),
bf AS (
  SELECT banded.* FROM banded JOIN sized USING (band, band_hash)
  WHERE sz <= 1000
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bf a JOIN bf b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
sets AS (SELECT doc_id, list_distinct(sh) AS sset FROM sh),
ver AS (
  SELECT id_a, id_b,
         len(list_intersect(sa.sset, sb.sset)) AS ni,
         len(sa.sset) + len(sb.sset) - len(list_intersect(sa.sset, sb.sset))
           AS nu
  FROM cand
  JOIN sets sa ON sa.doc_id = id_a
  JOIN sets sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, round(ni * 1.0 / nu, 6) AS jaccard
FROM ver WHERE ni * 1.0 / nu >= 0.5 ORDER BY id_a, id_b
"""


@register("minhash_near_dups", _MINHASH_PAIRS_SQL)
def q_minhash_pairs(spark, sf_dir):
    from .operators.dedup import minhash_dedup_pairs

    out = minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.5)
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def _ann_lsh_oracle_sql(dim: int = 64, n_planes: int = 6, seed: int = 7) -> str:
    """The LSH ANN pipeline is SQL-reproducible once the hyperplanes are
    baked in as literals: DuckDB recomputes sign-bit buckets, Hamming-1
    probes, and the exact cosine re-rank — a REAL oracle for the
    bucketing/probing logic, not a snapshot."""
    from .operators.similarity import _planes

    planes = _planes(dim, n_planes, seed)  # (dim, H); bucket bit i = sign(v·planes[:,i])
    plane_lits = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in planes[:, i]) + "]"
        for i in range(n_planes)
    )
    return f"""
WITH eb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
    list_sum(list_transform(range(0, {n_planes}), i ->
      CASE WHEN list_dot_product(embedding::DOUBLE[], [{plane_lits}][i + 1]) > 0
           THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM eb WHERE vec_id < 3),
probes AS (
  SELECT query_id, qv,
    unnest(list_prepend(qb,
      list_transform(range(0, {n_planes}), i -> xor(qb, 1::BIGINT << i))))
      AS bucket
  FROM q
),
scored AS (
  SELECT p.query_id AS query_id, e.vec_id AS vec_id,
         list_cosine_similarity(p.qv, e.v) AS sim_raw
  FROM probes p JOIN eb e USING (bucket)
),
ranked AS (
  SELECT query_id, vec_id, sim_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id)
           AS rank
  FROM scored
)
SELECT query_id, vec_id, round(sim_raw, 6) AS sim, rank::INTEGER AS rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


@register("ann_lsh_topk", _ann_lsh_oracle_sql())
def q_ann_lsh(spark, sf_dir):
    from .operators.similarity import lsh_topk

    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # 6 planes → 64 buckets: sized so buckets hold enough candidates for a
    # meaningful top-k at these row counts (recall/cost knob); Hamming-1
    # multi-probe lifts recall without widening buckets
    out = lsh_topk(emb, q, dim=dim, k=5, n_planes=6, probe_hamming=1)
    return out.select(
        "query_id", "vec_id", F.round("sim", 6).alias("sim"), "rank"
    ).orderBy("query_id", "rank")


@register("multimodal_features", None)
def q_multimodal(spark, sf_dir):
    from .operators.multimodal import extract_features, synth_media_df

    media = synth_media_df(spark, n=200)
    feats = extract_features(media, fake=True)
    return feats.select(
        "media_id", "kind", "n_bytes", F.round("byte_mean", 6).alias("byte_mean")
    ).orderBy("media_id")


@register("perplexity_stats", None)
def q_perplexity(spark, sf_dir):
    """Q2: char-trigram perplexity distribution per detected language."""
    from .models.factory import load_default_model
    from .operators.udfs import make_annotate_udf

    model = load_default_model()
    docs = _docs(spark, sf_dir).withColumn(
        "url", F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    )
    ann = make_annotate_udf(model, spark)("url", "text")
    return (
        docs.withColumn("_a", ann)
        .select(F.col("_a.lang").alias("lang_pred"), F.col("_a.ppl").alias("ppl"))
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("ppl"), 4).alias("avg_ppl"),
        )
        .orderBy("lang_pred")
    )
