"""Snapshot-oracle staleness gate.

The regression-pinned VALUES snapshots (tools/gen_snapshots.py) are
generated FROM THIS ENGINE's output: if a detector/trainer change ships
without regenerating them, the driver's oracle rows would silently pin the
OLD output and fail — or worse, a forgotten regen after an intentional
semantics change would leave green-but-wrong pins.  This test recomputes
every snapshot query at the pin scale (sf0.01) with the current engine and
byte-compares the generated SQL against the committed file, so a stale pin
fails HERE first, with a message that says exactly what to run.
"""

import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SF_DIR = "/root/testdata/sf0.01"


def test_snapshots_not_stale(spark):
    from tools.gen_snapshots import SNAPSHOT_QUERIES, snapshot_sql

    from language_detection_spark import queries as qmod

    if not Path(SF_DIR).exists():
        pytest.skip(f"pin-scale testdata missing: {SF_DIR}")

    snap_dir = ROOT / "language_detection_spark" / "data" / "oracle_snapshots"
    qs = qmod.queries()
    stale = []
    for name in SNAPSHOT_QUERIES:
        path = snap_dir / f"{name}.sql"
        assert path.exists(), f"missing snapshot for {name} — run tools/gen_snapshots.py"
        df = qs[name](spark, SF_DIR)
        cols = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        rows = [tuple(r) for r in df.collect()]
        fresh = snapshot_sql(name, cols, rows)
        if fresh != path.read_text(encoding="utf-8"):
            stale.append(name)
    assert not stale, (
        f"stale snapshot oracle(s) {stale}: engine output changed without a "
        f"pin regen — run `python tools/gen_snapshots.py {SF_DIR} "
        + " ".join(stale)
        + "` AND re-verify the Java-parity suites before committing"
    )
