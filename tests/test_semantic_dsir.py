"""Semantics tests for the two round-6 curation operators:

* semantic_dedup — SemDeDup-style cluster-partitioned cosine dedup
  (keep = canonical-min-id within cluster at sim ≥ τ); checked against a
  brute-force numpy re-implementation and on hand-built duplicates.
* dsir_scores — DSIR-style hashed-ngram importance scoring (target-vs-raw
  log-ratio, quantile selection); checked for domain monotonicity, the
  selection fraction, and the feature count arithmetic.

The cross-engine value contract for both is covered by the DuckDB oracles
(`tools/verify_contract.py`: semantic_dedup, dsir_scores — green at
sf0.01 and sf0.1); these tests pin the SEMANTICS on adversarial inputs
the synthetic corpus doesn't contain.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from language_detection_spark.operators.similarity import (
    kmeans_fit,
    semantic_dedup,
)
from language_detection_spark.operators.text_analysis import dsir_scores


def _emb_df(spark, X):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(X)]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_semantic_dedup_drops_exact_duplicate_keeps_singleton(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(24, 8)).astype(np.float32)
    X[7] = X[3]            # exact duplicate pair (3 keeps, 7 drops)
    X[20] = -X[5] * 3.0    # anti-parallel to 5: cosine −1, never a dup
    df = _emb_df(spark, X)
    out = semantic_dedup(df, n_centroids=3, threshold=0.9, sample_n=24)
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == 24, "one output row per input vector"
    assert rows[3].keep and not rows[7].keep
    assert rows[3].centroid == rows[7].centroid
    assert rows[20].keep


def test_semantic_dedup_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(60, 16)).astype(np.float32)
    # plant a few near-dup chains
    X[10] = X[2] + 0.01 * rng.normal(size=16).astype(np.float32)
    X[11] = X[2] + 0.01 * rng.normal(size=16).astype(np.float32)
    tau, k = 0.6, 4
    df = _emb_df(spark, X)
    got = {
        r.vec_id: (r.centroid, r.keep)
        for r in semantic_dedup(
            df, n_centroids=k, threshold=tau, sample_n=60
        ).collect()
    }
    # independent numpy re-derivation of the same keep rule
    Xd = X.astype(np.float64)
    C = kmeans_fit(Xd[:60], k)
    Xn = Xd / np.maximum(np.linalg.norm(Xd, axis=1, keepdims=True), 1e-12)
    assign = np.argmax(Xn @ C.T, axis=1)
    S = Xn @ Xn.T
    for i in range(60):
        same = [j for j in range(60) if assign[j] == assign[i] and j < i]
        keep = not any(S[i, j] >= tau for j in same)
        assert got[i] == (int(assign[i]), keep), f"vec {i}"


def test_dsir_scores_domain_monotonicity_and_selection(spark):
    # target domain speaks "alpha", raw background speaks "beta";
    # mixed docs sit in between → score must order by alpha fraction.
    rows = []
    for i in range(10):
        rows.append((i, "alpha " * 20, "tgt"))
    for i in range(10, 30):
        rows.append((i, "beta " * 20, "bg"))
    rows.append((30, "alpha alpha alpha alpha", "bg"))
    rows.append((31, "alpha alpha beta beta", "bg"))
    rows.append((32, "beta beta beta beta", "bg"))
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    out = dsir_scores(
        df, target_sources=("tgt",), n_buckets=64, select_quantile=0.5
    )
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 33
    assert got[30].score > got[31].score > got[32].score
    # pure-target text scores at the top; pure-background at the bottom
    assert got[0].score == max(r.score for r in got.values())
    assert got[0].selected and not got[32].selected
    # half the corpus sits above the median cut (strict > excludes ties)
    n_sel = sum(1 for r in got.values() if r.selected)
    assert 0 < n_sel <= 17
    # n_feats = unigrams + bigrams = w + (w-1)
    assert got[30].n_feats == 4 + 3


def test_dsir_scores_single_word_doc_has_no_bigrams(spark):
    df = spark.createDataFrame(
        [(0, "alpha", "tgt"), (1, "beta gamma", "bg"), (2, "beta", "bg")],
        "doc_id: long, text: string, source: string",
    )
    out = {r.doc_id: r for r in dsir_scores(
        df, target_sources=("tgt",), n_buckets=16
    ).collect()}
    assert out[0].n_feats == 1
    assert out[1].n_feats == 3


def test_semantic_dedup_plan_is_cluster_partitioned(spark):
    """The pairwise stage must join on the centroid key — never a global
    cross product — and the dropped-set application must be a join back
    on vec_id.  Guards the SemDeDup scale shape (Σ|cluster|², not n²)."""
    rng = np.random.default_rng(0)
    df = _emb_df(spark, rng.normal(size=(40, 8)).astype(np.float32))
    plan = semantic_dedup(
        df, n_centroids=2, threshold=0.5, sample_n=40
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "centroid" in plan


def test_dsir_plan_has_no_python_and_broadcasts_distributions(spark):
    """dsir_scores' feature hashing rides ONE Arrow-vectorized crossing
    (the round-7 batched twin of the md5 expression chain — never
    row-pickled BatchEvalPython), and both bucket-distribution joins
    broadcast (the ≤B-row side never shuffles the doc-scale stream)."""
    df = spark.createDataFrame(
        [(i, "alpha beta gamma", "tgt" if i < 2 else "bg") for i in range(6)],
        "doc_id: long, text: string, source: string",
    )
    plan = dsir_scores(
        df, target_sources=("tgt",), n_buckets=32
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # hashing is Arrow-vectorized; the persisted feature frame makes it a
    # single runtime evaluation (plan PRINTOUT repeats the cached subtree
    # under every InMemoryTableScan reference, so no occurrence count)
    assert "ArrowEvalPython" in plan and "InMemoryTableScan" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
