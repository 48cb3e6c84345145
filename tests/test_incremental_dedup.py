"""Incremental dedup against a persisted signature store: round-trip,
new-vs-store pair recovery, and append semantics."""

from pyspark.sql import functions as F

from language_detection_spark.operators.dedup import (
    banded_rows,
    build_sig_store,
    incremental_near_dups,
    minhash_signatures,
)


def _corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from all the hunters"
    )
    old_rows = [
        (0, base),
        (1, "completely different text about databases indexes and logs "
            "in modern storage engines running on commodity hardware"),
        (2, "unrelated musings on compilers type systems and abstract "
            "interpretation with widening operators and fixpoints"),
    ]
    new_rows = [
        (100, base.replace("green", "dark")),          # near-dup of 0
        (101, "entirely novel content mentioning oceans tides and moons "
              "with gravitational resonance effects in orbital dynamics"),
    ]
    return (
        spark.createDataFrame(old_rows, "doc_id long, text string"),
        spark.createDataFrame(new_rows, "doc_id long, text string"),
    )


def test_incremental_store_roundtrip(spark, tmp_path):
    old, new = _corpus(spark)
    store_path = str(tmp_path / "sig_store")
    build_sig_store(old, store_path)
    store = spark.read.parquet(store_path)
    # layout: partitioned by band, one row per (doc, band)
    assert sorted(store.columns) == ["band", "band_hash", "id", "sig"]
    assert store.count() == 3 * 4

    pairs = incremental_near_dups(new, store)
    got = {(r["id_new"], r["id_old"]): r["est_jaccard"]
           for r in pairs.collect()}
    assert (100, 0) in got
    assert got[(100, 0)] >= 0.5
    assert all(id_new != 101 for id_new, _ in got)


def test_incremental_matches_in_memory_store(spark, tmp_path):
    old, new = _corpus(spark)
    store_path = str(tmp_path / "sig_store2")
    build_sig_store(old, store_path)
    from_disk = incremental_near_dups(
        new, spark.read.parquet(store_path)
    ).collect()
    in_mem = incremental_near_dups(
        new, banded_rows(minhash_signatures(old))
    ).collect()
    assert sorted(map(tuple, from_disk)) == sorted(map(tuple, in_mem))


def test_store_append_admits_new_docs(spark, tmp_path):
    old, new = _corpus(spark)
    store_path = str(tmp_path / "sig_store3")
    build_sig_store(old, store_path)
    build_sig_store(new, store_path, mode="append")
    store = spark.read.parquet(store_path)
    assert store.select("id").distinct().count() == 5
    # a later batch that duplicates an APPENDED doc is now caught
    later = spark.createDataFrame(
        [(200, new.filter(F.col("doc_id") == 100).first()["text"])],
        "doc_id long, text string",
    )
    got = {(r["id_new"], r["id_old"])
           for r in incremental_near_dups(later, store).collect()}
    assert (200, 100) in got
