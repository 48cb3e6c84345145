"""Semantics tests for overlapping text chunking and TF-IDF top-terms.

Cross-engine value contracts are covered by the `text_chunks` and
`tfidf_top_terms` DuckDB oracles (full re-derivations, green at sf0.01
and sf0.1); these tests pin the semantics on hand-built corpora: chunk
geometry and coverage invariants, the integer-exact ranking, and the
plan shapes.
"""

import math

from pyspark.sql import functions as F

from language_detection_spark.operators.text_analysis import (
    chunk_text,
    tfidf_top_terms,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_chunk_geometry_hand_computed(spark):
    # 10 tokens, chunk=4, stride=3 → chunks at 0,3,6 and the tail at 9:
    # n_chunks = 1 + ceil((10-4)/3) = 3 → starts 0,3,6; chunk 2 covers
    # tokens 6..9 (4 tokens) — wait: 1+ceil(6/3)=3 chunks, last start 6,
    # tokens 6..9 inclusive = 4 tokens, token 9 covered. Exactly 3 chunks.
    text = " ".join(f"t{i}" for i in range(10))
    out = sorted(
        chunk_text(_df(spark, [(0, text)]), chunk_tokens=4, stride=3).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [(r.chunk_idx, r.tok_start, r.n_chunk_tokens) for r in out] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4),
    ]
    assert out[1].chunk == "t3 t4 t5 t6"
    # short tail: 11 tokens → 4th chunk of 2 tokens
    out2 = chunk_text(
        _df(spark, [(0, text + " t10")]), chunk_tokens=4, stride=3
    ).collect()
    tail = max(out2, key=lambda r: r.chunk_idx)
    assert (tail.chunk_idx, tail.tok_start, tail.n_chunk_tokens) == (3, 9, 2)
    assert tail.chunk == "t9 t10"


def test_chunk_coverage_and_overlap_invariants(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(1 + (i * 11) % 150)))
            for i in range(40)] + [(99, "")]
    T, S = 16, 12
    out = chunk_text(_df(spark, rows), chunk_tokens=T, stride=S).collect()
    assert not any(r.doc_id == 99 for r in out), "empty doc yields no chunks"
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        n = 1 + (doc_id * 11) % 150
        rs.sort(key=lambda r: r.chunk_idx)
        want = 1 if n <= T else 1 + math.ceil((n - T) / S)
        assert len(rs) == want
        # every token covered; consecutive chunks overlap by T - S
        assert rs[0].tok_start == 0
        assert rs[-1].tok_start + rs[-1].n_chunk_tokens == n
        for a, b in zip(rs, rs[1:]):
            assert b.tok_start == a.tok_start + S
            assert a.tok_start + T > b.tok_start, "chunks overlap"
        for r in rs:
            assert len(r.chunk.split()) == r.n_chunk_tokens


def test_chunk_plan_is_shuffle_free(spark):
    df = _df(spark, [(0, "a b c d e")])
    plan = chunk_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "chunking must be map-side only"


def test_tfidf_hand_computed_ranking(spark):
    # 3 docs; "rare" appears only in doc 0, "common" in all docs.
    rows = [
        (0, "rare common common"),
        (1, "common alpha beta"),
        (2, "common alpha gamma"),
    ]
    out = tfidf_top_terms(_df(spark, rows), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.rank] = r
    # doc 0: idf(rare) = ln(4/2)+1 ≈ 1.693, score 1_693_147;
    # idf(common) = ln(4/4)+1 = 1.0, tf 2 → 2_000_000 → common ranks 1st
    assert by_doc[0][1].term == "common" and by_doc[0][1].score_micro == 2_000_000
    assert by_doc[0][2].term == "rare"
    assert by_doc[0][2].score_micro == round((math.log(2) + 1) * 1_000_000)
    # doc 1: beta (df=1, idf ln(2)+1) outranks alpha (df=2, idf ln(4/3)+1)
    assert by_doc[1][1].term == "beta" and by_doc[1][2].term == "alpha"
    assert by_doc[1][1].score_micro == round((math.log(2) + 1) * 1_000_000)
    assert all(len(v) <= 2 for v in by_doc.values())
    # genuine tie (same tf, same df in one doc) breaks by term asc
    tie = tfidf_top_terms(
        _df(spark, [(0, "zed yak"), (1, "other")]), k=2
    ).collect()
    t0 = sorted((r for r in tie if r.doc_id == 0), key=lambda r: r.rank)
    assert [r.term for r in t0] == ["yak", "zed"]
    assert t0[0].score_micro == t0[1].score_micro


def test_tfidf_integer_scores_and_k_cap(spark):
    rows = [(i, " ".join(f"w{(i + j) % 9}" for j in range(12)))
            for i in range(20)]
    out = tfidf_top_terms(_df(spark, rows), k=3).collect()
    assert all(isinstance(r.score_micro, int) for r in out)
    from collections import Counter

    c = Counter(r.doc_id for r in out)
    assert all(v <= 3 for v in c.values())
    # ranks are 1..k dense per doc
    for d in c:
        ranks = sorted(r.rank for r in out if r.doc_id == d)
        assert ranks == list(range(1, len(ranks) + 1))


def test_tfidf_plan_broadcasts_small_sides(spark):
    df = _df(spark, [(i, "a b c") for i in range(30)])
    plan = tfidf_top_terms(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
