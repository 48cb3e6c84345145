"""Semantics tests for sequence packing and language-mixture rebalancing.

The cross-engine value contract is covered by the DuckDB oracles
(`packed_sequences`, `language_rebalance` — full re-derivations, green at
sf0.01 and sf0.1); these tests pin the SEMANTICS on hand-built corpora:
the concat-and-chunk slice geometry, conservation invariants, layout
invariance, mixture calibration, and the plan shapes that make both
operators scale.
"""

import pytest
from pyspark.sql import functions as F

from language_detection_spark.operators.packing import pack_sequences
from language_detection_spark.operators.text_analysis import language_rebalance


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_pack_sequences_hand_computed_single_shard(spark):
    # one shard so the concat order is just doc_id; L=5
    # doc 0: 3 tokens [0,3) ; doc 1: 4 tokens [3,7) ; doc 2: 7 tokens [7,14)
    df = _docs(spark, [
        (0, "a b c"),
        (1, "d e f g"),
        (2, "h i j k l m n"),
    ])
    out = sorted(
        pack_sequences(df, seq_len=5, n_shards=1).collect(),
        key=lambda r: (r.seq_id, r.doc_id),
    )
    got = [(r.seq_id, r.doc_id, r.seq_start, r.seq_end, r.doc_offset) for r in out]
    assert got == [
        (0, 0, 0, 3, 0),   # doc 0 fills seq0[0:3)
        (0, 1, 3, 5, 0),   # doc 1 starts seq0[3:5), first 2 tokens
        (1, 1, 0, 2, 2),   # ...continues in seq1[0:2) from its token 2
        (1, 2, 2, 5, 0),   # doc 2 starts seq1[2:5)
        (2, 2, 0, 4, 3),   # ...and finishes in seq2[0:4) from its token 3
    ]
    assert all(r.shard == 0 for r in out)


def test_pack_sequences_conservation_invariants(spark):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(1 + (i * 7) % 23)))
            for i in range(80)]
    rows.append((80, "   "))  # zero-token doc: excluded
    df = _docs(spark, rows)
    L = 16
    out = pack_sequences(df, seq_len=L, n_shards=4).collect()
    assert not any(r.doc_id == 80 for r in out)
    # per-document: slices partition the doc's tokens, in order
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.seq_id)
        assert sum(r.seq_end - r.seq_start for r in rs) == rs[0].n_tokens
        assert rs[0].doc_offset == 0
        for a, b in zip(rs, rs[1:]):
            assert b.seq_id == a.seq_id + 1, "doc spans consecutive seqs"
            assert b.doc_offset == a.doc_offset + (a.seq_end - a.seq_start)
            assert a.seq_end == L and b.seq_start == 0
    # per-sequence: slices tile [0, L) exactly; only the last seq of a
    # shard may be partial
    by_seq = {}
    for r in out:
        by_seq.setdefault((r.shard, r.seq_id), []).append(r)
    last_seq = {s: max(q for (sh, q) in by_seq if sh == s)
                for s in {sh for (sh, _) in by_seq}}
    for (shard, seq_id), rs in by_seq.items():
        rs.sort(key=lambda r: r.seq_start)
        assert rs[0].seq_start == 0
        for a, b in zip(rs, rs[1:]):
            assert b.seq_start == a.seq_end, "no gaps, no overlaps"
        if seq_id < last_seq[shard]:
            assert rs[-1].seq_end == L, "interior sequences are full"


def test_pack_sequences_layout_invariant(spark):
    rows = [(i, " ".join(f"t{j}" for j in range(1 + i % 9))) for i in range(60)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, pack_sequences(df, seq_len=8, n_shards=4).collect()))
    b = sorted(map(tuple, pack_sequences(
        df.repartition(13), seq_len=8, n_shards=4).collect()))
    assert a == b


def test_pack_sequences_plan_is_shard_partitioned(spark):
    """The running sum must window per shard — never a single global
    ordered partition (the 100-TB bottleneck this design avoids)."""
    df = _docs(spark, [(i, "a b c") for i in range(20)])
    plan = pack_sequences(df, seq_len=4, n_shards=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "shard" in plan


def test_language_rebalance_calibration_and_binding_language(spark):
    rows = [(i, "en") for i in range(1000)] + [(1000 + i, "fr") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    out = language_rebalance(df, {"en": 500, "fr": 500}).collect()
    # N* = min(1000*1000//500, 100*1000//500) = 200 → en rate 100k ppm,
    # fr rate 1e6 (binding language keeps everything)
    rates = {r.lang: r.rate_ppm for r in out}
    assert rates == {"en": 100_000, "fr": 1_000_000}
    n_en = sum(1 for r in out if r.lang == "en")
    n_fr = sum(1 for r in out if r.lang == "fr")
    assert n_fr == 100
    assert 60 <= n_en <= 140, f"en kept {n_en}, expected ≈100"
    assert all(r.sample_bucket < r.rate_ppm for r in out)


def test_language_rebalance_drops_untargeted_language(spark):
    df = spark.createDataFrame(
        [(0, "en"), (1, "xx"), (2, "en")], "doc_id: long, lang: string"
    )
    out = language_rebalance(df, {"en": 1000}).collect()
    assert {r.lang for r in out} == {"en"}
    assert {r.doc_id for r in out} == {0, 2}  # rate 1e6 keeps all en


def test_language_rebalance_rejects_bad_target(spark):
    df = spark.createDataFrame([(0, "en")], "doc_id: long, lang: string")
    with pytest.raises(ValueError):
        language_rebalance(df, {})
    with pytest.raises(ValueError):
        language_rebalance(df, {"en": 0})


def test_language_rebalance_plan_broadcasts_rates(spark):
    """The rates join must broadcast the ≤|langs|-row side; the keep
    decision is a map-side filter — no data-scale shuffle."""
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr") for i in range(50)],
        "doc_id: long, lang: string",
    )
    plan = language_rebalance(df, {"en": 500, "fr": 500}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
