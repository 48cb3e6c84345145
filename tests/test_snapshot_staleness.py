"""Snapshot-oracle staleness gate.

The regression-pinned VALUES snapshots (tools/gen_snapshots.py) are
generated FROM THIS ENGINE's output: if a detector/trainer change ships
without regenerating them, the driver's oracle rows would silently pin the
OLD output and fail — or worse, a forgotten regen after an intentional
semantics change would leave green-but-wrong pins.  This test recomputes
every snapshot query at BOTH pin scales (sf0.01 — the driver's
correctness scale — and sf0.1 — the scale-up gate, pins under
oracle_snapshots/sf0.1/) with the current engine and byte-compares the
generated SQL against the committed files, so a stale pin fails HERE
first, with a message that says exactly what to run.
"""

import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SNAP_ROOT = ROOT / "language_detection_spark" / "data" / "oracle_snapshots"

SCALES = [
    ("/root/testdata/sf0.01", SNAP_ROOT),
    ("/root/testdata/sf0.1", SNAP_ROOT / "sf0.1"),
]


@pytest.mark.parametrize(
    "sf_dir,snap_dir", SCALES, ids=[s[0].rsplit("/", 1)[-1] for s in SCALES]
)
def test_snapshots_not_stale(spark, sf_dir, snap_dir):
    from tools.gen_snapshots import SNAPSHOT_QUERIES, snapshot_sql

    from language_detection_spark import queries as qmod

    if not Path(sf_dir).exists():
        pytest.skip(f"pin-scale testdata missing: {sf_dir}")

    scale = Path(sf_dir).name
    qs = qmod.queries()
    stale = []
    for name in SNAPSHOT_QUERIES:
        path = snap_dir / f"{name}.sql"
        assert path.exists(), (
            f"missing {scale} snapshot for {name} — run "
            f"`python tools/gen_snapshots.py {sf_dir}`"
        )
        df = qs[name](spark, sf_dir)
        cols = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        rows = [tuple(r) for r in df.collect()]
        fresh = snapshot_sql(name, cols, rows, scale=scale)
        if fresh != path.read_text(encoding="utf-8"):
            stale.append(name)
    assert not stale, (
        f"stale {scale} snapshot oracle(s) {stale}: engine output changed "
        f"without a pin regen — run `python tools/gen_snapshots.py {sf_dir} "
        + " ".join(stale)
        + "` AND re-verify the Java-parity suites before committing"
    )
