"""Semantics tests for no-split FFD document packing.

The cross-engine contract is covered by the `packed_documents` oracle (an
independent plain-Python FFD baked as literals — green at sf0.01 and
sf0.1); these tests pin the packing invariants and adversarial cases:
capacity respected, FFD order, oversize singletons, differential match
against the local arbiter, layout invariance.
"""

from pyspark.sql import functions as F

from language_detection_spark.operators.packing import (
    pack_documents,
    pack_documents_local,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _toy(n):
    return [(i, " ".join(f"w{j}" for j in range(1 + (i * 13) % 40)))
            for i in range(n)]


def test_ffd_capacity_and_totals(spark):
    rows = _toy(120)
    L = 32
    out = pack_documents(_df(spark, rows), seq_len=L, n_shards=4).collect()
    assert len(out) == 120
    fills = {}
    # docs run 1..40 tokens, so some exceed L=32 → oversize singletons
    oversize = [r for r in out if r.oversize]
    normal = [r for r in out if not r.oversize]
    assert all(r.n_tokens > L for r in oversize)
    assert all(r.n_tokens <= L for r in normal)
    for r in normal:
        fills[(r.shard, r.bin_id)] = fills.get((r.shard, r.bin_id), 0) + r.n_tokens
    assert all(v <= L for v in fills.values()), "bin capacity respected"
    # oversize bins are singletons
    from collections import Counter

    c = Counter((r.shard, r.bin_id) for r in oversize)
    assert all(v == 1 for v in c.values())
    assert not (set(c) & set(fills)), "oversize bins hold nothing else"


def test_ffd_matches_local_arbiter(spark):
    rows = _toy(90) + [(1000, "x " * 300), (1001, "")]  # oversize + empty
    got = sorted(map(tuple, pack_documents(
        _df(spark, rows), seq_len=64, n_shards=4).collect()))
    want = sorted(pack_documents_local(rows, seq_len=64, n_shards=4))
    assert got == want
    assert not any(r[2] == 1001 for r in got), "empty doc excluded"
    assert any(r[2] == 1000 and r[4] for r in got), "oversize flagged"


def test_ffd_layout_invariant(spark):
    rows = _toy(60)
    df = _df(spark, rows)
    a = sorted(map(tuple, pack_documents(df, seq_len=48, n_shards=4).collect()))
    b = sorted(map(tuple, pack_documents(
        df.repartition(9), seq_len=48, n_shards=4).collect()))
    assert a == b


def test_ffd_is_first_fit_decreasing(spark):
    # one shard; sizes chosen so FFD is hand-checkable with L=10:
    # order by (size desc, id): 7(a) 6(b) 4(c) 3(d) 2(e)
    # bins: [7,3] [6,4] [2] → a,d in bin0; b,c in bin1; e in bin2
    rows = [
        (0, "x " * 7), (1, "x " * 6), (2, "x " * 4),
        (3, "x " * 3), (4, "x " * 2),
    ]
    out = {r.doc_id: r.bin_id for r in pack_documents(
        _df(spark, rows), seq_len=10, n_shards=1).collect()}
    assert out == {0: 0, 3: 0, 1: 1, 2: 1, 4: 2}


def test_run_packing_job_end_to_end(spark, tmp_path):
    import json
    import sys
    from io import StringIO

    sys.path.insert(0, "jobs")
    import run_packing

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(1 + i % 30))) for i in range(100)],
        "doc_id: long, text: string",
    )
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    for mode, unit in (("chunk", "n_sequences"), ("ffd", "n_bins")):
        out = str(tmp_path / f"out_{mode}")
        buf, old = StringIO(), sys.stdout
        sys.stdout = buf
        try:
            rc = run_packing.main(
                ["--input", inp, "--output", out, "--mode", mode,
                 "--seq-len", "64", "--n-shards", "4"]
            )
        finally:
            sys.stdout = old
        assert rc == 0
        summary = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert summary[unit] > 0 and 0 < summary["fill_factor"] <= 1
        written = spark.read.parquet(out)
        assert written.count() == summary["rows"] > 0
        assert "shard" in written.columns  # partitioned layout round-trips
