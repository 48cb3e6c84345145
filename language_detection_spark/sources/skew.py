"""Skewed-corpus synthesizer for dedup stress tests/benchmarks.

Models the web-scale pathology minhash LSH must survive: a BOILERPLATE
cluster (error pages, parked domains — many byte-identical documents whose
every LSH bucket would otherwise go quadratic) mixed into a long tail of
distinct documents with a known set of PLANTED near-duplicate pairs to
measure recall against.

Generated entirely with Spark expressions (spark.range + hash-seeded word
picks) — no driver-side loops, so it scales to millions of rows for the
benchmark and stays deterministic (F.hash of the id, no RNG).

Layout for ``synth_skewed_corpus(spark, n_docs, boiler_n)``:
  * ids [0, boiler_n)                 → one identical template text
  * ids >= boiler_n with (id - boiler_n) % 100 in {0, 1} → planted pairs:
    both ids share a 30-word body seeded by the pair id; the odd member
    appends one extra word (shingle Jaccard ≈ 28/31 ≈ 0.90)
  * everything else                   → 20 unique hash-seeded words
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VOCAB = [
    f"w{i:03d}" for i in range(500)
]  # small vocab → realistic shingle collisions

_TEMPLATE = (
    "this domain is parked free courtesy of the registrar please check back "
    "later for exciting content this page was generated automatically"
)


def planted_pair_ids(n_docs: int, boiler_n: int) -> list[tuple[int, int]]:
    """The (even_id, odd_id) near-dup pairs the generator plants."""
    out = []
    i = boiler_n
    while i + 1 < n_docs:
        out.append((i, i + 1))
        i += 100
    return out


def synth_skewed_corpus(
    spark: SparkSession, n_docs: int, boiler_n: int
) -> DataFrame:
    """(doc_id bigint, text string) with the layout documented above."""
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    ids = spark.range(0, n_docs).select(F.col("id").alias("doc_id"))
    rel = F.col("doc_id") - F.lit(boiler_n)
    is_boiler = F.col("doc_id") < boiler_n
    is_pair = (~is_boiler) & (rel % 100 < 2)
    # pair members share a body seed; tail docs seed on their own id
    body_seed = F.when(is_pair, F.lit(boiler_n) + (rel - rel % 100)).otherwise(
        F.col("doc_id")
    )
    n_words = F.when(is_pair, F.lit(30)).otherwise(F.lit(20))

    def word_at(i):
        return F.element_at(
            vocab, (F.pmod(F.hash(body_seed * 1009 + i), F.lit(len(_VOCAB)))) + 1
        )

    body = F.concat_ws(
        " ",
        F.transform(F.sequence(F.lit(1), n_words), word_at),
    )
    text = (
        F.when(is_boiler, F.lit(_TEMPLATE))
        .when(is_pair & (rel % 2 == 1), F.concat(body, F.lit(" extraword")))
        .otherwise(body)
    )
    return ids.select("doc_id", text.alias("text"))
