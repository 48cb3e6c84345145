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


def test_cap_per_source_equals_global_window(spark):
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from language_detection_spark.operators.text_analysis import (
        cap_per_source,
        quality_score,
    )

    rng = random.Random(3)
    vocab = ["alpha", "beta", "gamma", "delta", "words", "tokens", "value"]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 60))),
         f"host-{i % 5}")
        for i in range(200)
    ]
    # hot source: 100 extra docs on one host (the skew case the salting
    # exists for)
    rows += [
        (1000 + i, " ".join(rng.choices(vocab, k=30)), "host-0")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source"], r["rank"]): r["doc_id"]
        for r in cap_per_source(df, k=3).collect()
    }
    w = Window.partitionBy("source").orderBy(
        F.desc("_q"), F.asc("doc_id")
    )
    expected = {
        (r["source"], r["rank"]): r["doc_id"]
        for r in df.withColumn("_q", quality_score(F.col("text")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    assert got == expected
    assert len([1 for (s, _) in got if s == "host-0"]) == 3


def test_holdout_split_deterministic_and_calibrated(spark):
    from language_detection_spark.operators.text_analysis import holdout_split

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["split_bucket"], r["is_holdout"])
         for r in holdout_split(df).collect()}
    # invariant under physical layout
    b = {r["doc_id"]: (r["split_bucket"], r["is_holdout"])
         for r in holdout_split(df.repartition(13)).collect()}
    assert a == b
    frac = sum(1 for _, h in a.values() if h) / len(a)
    assert 0.08 < frac < 0.12  # 100 permille, binomial tolerance
    # independent salt draws an (almost surely) different split
    c = {r["doc_id"]: r["is_holdout"]
         for r in holdout_split(df, salt="split:v2").collect()}
    assert any(c[k] != v[1] for k, v in a.items())


def test_quality_terciles_balanced_per_language(spark):
    import random

    from language_detection_spark.operators.text_analysis import (
        quality_terciles,
    )

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "words", "tokens"]
    # k < 50 keeps the length sub-score off its saturation plateau, so
    # scores are distinct enough for meaningful terciles
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(5, 45))),
         "en" if i % 2 == 0 else "de")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = quality_terciles(df).collect()
    assert len(out) == 300
    for lang in ("en", "de"):
        counts = {"tail": 0, "middle": 0, "head": 0}
        for r in out:
            if r["lang"] == lang:
                counts[r["tercile"]] += 1
        # terciles within each language are roughly balanced (ties on
        # discrete scores can shift the boundaries)
        assert all(20 <= v <= 80 for v in counts.values()), counts
        # label ordering respects the score ordering
        tail_max = max(r["q_score"] for r in out
                       if r["lang"] == lang and r["tercile"] == "tail")
        head_min = min(r["q_score"] for r in out
                       if r["lang"] == lang and r["tercile"] == "head")
        assert tail_max < head_min


def test_decontaminate_planted_overlap(spark):
    """A train doc sharing an n-word span with an eval doc is flagged;
    disjoint docs are not; short docs have zero grams; counts are
    occurrence-based and the plan broadcasts the eval hash set."""
    from language_detection_spark.operators.text_analysis import decontaminate

    span = "one two three four five"
    ev = spark.createDataFrame(
        [(1000, f"benchmark question {span} answer choices")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (0, f"prefix words then {span} and a suffix"),     # planted hit
            (1, "completely disjoint content with other terms here"),
            (2, "tiny doc"),                                   # < n words
            (3, f"{span} {span} again"),                       # hit twice+
        ],
        "doc_id long, text string",
    )
    out = decontaminate(train, ev, n=5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["contaminated"] and rows[0]["n_contaminated"] >= 1
    assert not rows[1]["contaminated"] and rows[1]["n_contaminated"] == 0
    assert rows[2]["n_grams"] == 0 and not rows[2]["contaminated"]
    assert rows[3]["contaminated"] and rows[3]["n_contaminated"] >= 2
    # n_grams = occurrences: len(words) - n + 1 (doc 0 has 11 words)
    assert rows[0]["n_grams"] == 11 - 5 + 1
    # scale shape: the eval side must ride a broadcast join (never a
    # shuffle of the training corpus against the benchmark)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_weighted_sample_deterministic_and_calibrated(spark):
    """Hash-Bernoulli mixing: identical output across partitionings, a
    different draw under a different salt, empirical per-source keep rate
    near the target, and a map-side plan (no shuffle, no sample())."""
    from language_detection_spark.operators.text_analysis import (
        weighted_sample_by_source,
    )

    rows = [(i, f"src{i % 5}") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r["doc_id"] for r in weighted_sample_by_source(df).collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample_by_source(df.repartition(13)).collect()
    }
    assert a == b  # layout-invariant
    c = {
        r["doc_id"]
        for r in weighted_sample_by_source(df, salt="mix:v2").collect()
    }
    assert c != a  # independent draw
    out = weighted_sample_by_source(df).collect()
    kept = {}
    rates = {}
    for r in out:
        kept[r["source"]] = kept.get(r["source"], 0) + 1
        rates[r["source"]] = r["keep_rate"]
    for src, rate in rates.items():
        emp = kept[src] / 1000.0  # 1000 docs per source
        assert abs(emp - rate) < 0.06, (src, emp, rate)
    plan = weighted_sample_by_source(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side filter
