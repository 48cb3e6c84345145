"""Local replica of the driver's correctness harness: run every
``queries()`` entry on Spark and compare row-count / schema / sorted
values against the DuckDB ``oracle_sql()`` at the given scale factor.

Usage: python tools/verify_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    skip_snapshots = False
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    if "--skip-snapshots" in args:
        skip_snapshots = True
        args.remove("--skip-snapshots")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    import os

    # lazy oracles (IVF centroids, perplexity LM bake) receive sf_dir
    # explicitly below; the env hint is kept for any zero-arg resolver
    os.environ["SPARK_GRAFT_SF_ORACLE"] = sf_dir
    import __spark_entry__ as entrymod
    from language_detection_spark.config import get_spark

    skipped: list[str] = []
    if skip_snapshots:
        # VALUES-snapshot pins are generated at sf0.01 — at any other
        # scale they are wrong BY CONSTRUCTION, not a failure
        from tools.gen_snapshots import SNAPSHOT_QUERIES

        skipped = list(SNAPSHOT_QUERIES)
    spark = get_spark("verify-contract")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql(sf_dir)
    con = duck_conn(sf_dir)
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in skipped:
            print(f"skip  {name}: sf0.01-pinned snapshot oracle")
            results[name] = {"skipped": "snapshot oracle is sf0.01-scale"}
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            results[name] = {"err": f"spark: {e}"}
            continue
        finally:
            # dedup/ANN queries persist intermediates for the action's
            # lifetime; release so a full-registry run doesn't stack caches
            from language_detection_spark.plans.caching import (
                release_tracked_caches,
            )

            release_tracked_caches()
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [rows-only]")
            results[name] = {"rows_only": True, "spark_rows": len(srows)}
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            results[name] = {"err": f"duckdb: {e}"}
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        rec = {
            "rows_match": len(sr) == len(dr),
            "schema_match": sc == dc,
            "values_match": sr == dr,
            "spark_rows": len(sr),
            "oracle_rows": len(dr),
            "secs": round(time.time() - t0, 1),
        }
        results[name] = rec
        if sc != dc:
            print(f"FAIL  {name}: columns {sc} vs {dc}")
            failures.append(name)
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(dr)}")
            failures.append(name)
        elif sr != dr:
            bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {bad}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(sr)} rows ({time.time()-t0:.1f}s)")
    spark.stop()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
        print(f"wrote {json_out}")
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries verified")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
