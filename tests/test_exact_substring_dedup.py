"""Semantics tests for ExactSubstr dedup (Lee et al. 2022 style):
corpus-wide duplicated k-token windows removed from all but the canonical
first occurrence, overlapping windows merged to maximal spans, documents
rebuilt from surviving tokens.

The cross-engine value contract is covered by the `exact_substring_dedup`
DuckDB oracle (full re-derivation, green at sf0.01 and sf0.1); these
tests pin the SEMANTICS on hand-built corpora the synthetic data doesn't
isolate: span merging, first-occurrence retention, within-doc repeats,
whole-doc duplicates, short/blank docs.
"""

from pyspark.sql import functions as F

from language_detection_spark.operators.dedup import exact_substring_dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _run(spark, rows, k):
    out = exact_substring_dedup(_df(spark, rows), k=k).collect()
    return {r.doc_id: r for r in out}


def test_shared_span_removed_from_later_doc_only(spark):
    span = " ".join(f"s{i}" for i in range(10))  # 10 shared tokens
    rows = [
        (0, f"alpha beta {span} gamma delta"),
        (1, f"one two three {span} four five"),
    ]
    got = _run(spark, rows, k=8)
    # doc 0 holds every canonical first occurrence: nothing removed
    assert got[0].n_tokens_removed == 0
    assert got[0].text_dedup == rows[0][1]
    # doc 1: three overlapping dup windows (10-8+1) merge into ONE
    # 10-token span; surrounding unique text survives
    assert got[1].n_dup_windows == 3
    assert got[1].n_tokens_removed == 10
    assert got[1].text_dedup == "one two three four five"


def test_whole_doc_duplicate_fully_excised(spark):
    text = " ".join(f"w{i}" for i in range(12))
    got = _run(spark, [(0, text), (1, text), (2, "unrelated words only")], k=8)
    assert got[0].text_dedup == text and got[0].n_tokens_removed == 0
    assert got[1].text_dedup == "" and got[1].n_tokens_removed == 12
    assert got[2].text_dedup == "unrelated words only"
    assert got[2].n_windows == 0  # 3 tokens < k


def test_within_doc_repeat_keeps_first_copy(spark):
    s = " ".join(f"r{i}" for i in range(8))
    got = _run(spark, [(0, f"{s} {s}")], k=8)
    # second copy of the 8-token span removed; windows crossing the
    # boundary are unique and must not drag extra tokens away
    assert got[0].text_dedup == s
    assert got[0].n_tokens_removed == 8
    assert got[0].n_windows == 9  # 16 - 8 + 1


def test_short_blank_and_whitespace_docs(spark):
    got = _run(
        spark,
        [(0, "tiny doc"), (1, ""), (2, "   "), (3, "  spaced   out  ")],
        k=8,
    )
    assert got[0].text_dedup == "tiny doc" and got[0].n_windows == 0
    assert got[1].text_dedup == "" and got[1].n_tokens_removed == 0
    assert got[2].text_dedup == ""
    assert got[3].text_dedup == "spaced out"  # rebuild normalizes spacing
    assert all(got[i].n_dup_windows == 0 for i in got)


def test_adjacent_spans_merge_to_maximal_interval(spark):
    # doc 1 duplicates TWO different spans of doc 0 that sit adjacent in
    # doc 1 — the islands pass must merge them into one removal interval
    a = " ".join(f"a{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    rows = [
        (0, f"{a} filler words here now {b}"),
        (1, f"lead {a} {b} tail"),
    ]
    got = _run(spark, rows, k=8)
    assert got[0].n_tokens_removed == 0
    assert got[1].text_dedup == "lead tail"
    assert got[1].n_tokens_removed == 16


def test_layout_invariant_and_plan_shape(spark):
    rows = [(i, " ".join(f"t{(i * 3 + j) % 11}" for j in range(20)))
            for i in range(40)]
    df = _df(spark, rows)
    a = sorted(map(tuple, exact_substring_dedup(df, k=6).collect()))
    b = sorted(map(tuple, exact_substring_dedup(
        df.repartition(7), k=6).collect()))
    assert a == b
    plan = exact_substring_dedup(df, k=6) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
