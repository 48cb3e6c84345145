"""C4 line-filter semantics (Raffel et al. 2020 §2.2): per-line
terminal-punctuation / min-words / javascript rules and page-level
lorem-ipsum / curly-brace / min-kept-lines drops.  The cross-engine
value contract is the `c4_line_filter` DuckDB oracle (full construction
+ filter re-derivation); these tests pin each rule in isolation."""

from pyspark.sql import functions as F

from language_detection_spark.operators.line_filter import (
    c4_line_filter,
    synth_page_lines,
)


def _run(spark, pages, **kw):
    df = spark.createDataFrame(pages, "doc_id: long, text: string")
    return {r.doc_id: r for r in c4_line_filter(df, **kw).collect()}


def test_per_line_rules(spark):
    text = "\n".join(
        [
            "a good long sentence.",  # kept
            "an excited long sentence!",  # kept
            "is this a question?",  # kept
            'he said "stop here."',  # kept (ends in .)
            'a quoted ending line"',  # kept (terminal quote)
            "no terminal punctuation here",  # dropped
            "two words.",  # dropped (<3 words)
            "please enable JavaScript to continue.",  # dropped
        ]
    )
    out = _run(spark, [(0, text)])
    r = out[0]
    assert r.n_lines == 8
    assert r.n_kept_lines == 5
    assert r.keep_page
    assert "no terminal" not in r.filtered_text
    assert "two words." not in r.filtered_text
    assert "JavaScript" not in r.filtered_text
    assert r.filtered_text.count("\n") == 4


def test_page_level_drops(spark):
    good = "one fine sentence here.\nand another fine one.\na third one too."
    out = _run(
        spark,
        [
            (0, good),
            (1, good + "\nsome Lorem Ipsum filler text."),
            (2, good + "\nif (x) { return; }"),
            (3, "only one good sentence here."),  # < min_kept_lines
        ],
    )
    assert out[0].keep_page
    assert not out[1].keep_page
    assert not out[2].keep_page
    assert not out[3].keep_page and out[3].n_kept_lines == 1


def test_empty_kept_is_empty_string_not_null(spark):
    out = _run(spark, [(0, "no punct at all")])
    assert out[0].n_kept_lines == 0
    assert out[0].filtered_text == ""


def test_knobs(spark):
    text = "one good sentence here.\nand a second one."
    out = _run(spark, [(0, text)], min_kept_lines=2)
    assert out[0].keep_page
    out = _run(spark, [(0, "two words.\nother two.")], min_words_per_line=2)
    assert out[0].n_kept_lines == 2


def test_synth_pages_exercise_every_rule(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(40))) for i in range(80)],
        "doc_id: long, text: string",
    )
    pages = synth_page_lines(docs)
    assert pages.columns == ["doc_id", "text"]
    out = c4_line_filter(pages)
    agg = out.agg(
        F.sum(F.col("n_lines") - F.col("n_kept_lines")).alias("dropped"),
        F.sum(F.when(~F.col("keep_page"), 1).otherwise(0)).alias("pages"),
    ).collect()[0]
    assert agg.dropped > 0 and agg.pages > 0  # both rule levels fire


def test_whole_stage_codegen_no_python(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h i j")], "doc_id: long, text: string"
    )
    plan = (
        c4_line_filter(synth_page_lines(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
