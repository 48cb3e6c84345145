"""End-to-end parity against the REFERENCE'S OWN Java detector: compile
the read-only reference sources (tools/java_parity), run both engines
seeded on the same texts + real 53 profiles, require identical label lists
and probabilities to 1e-9 (measured drift is ~1e-16)."""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]

requires_jdk = pytest.mark.skipif(
    shutil.which("javac") is None
    or not Path("/root/reference/src/main/java").is_dir(),
    reason="needs a JDK and the read-only reference sources",
)


@requires_jdk
def test_java_reference_parity():
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools/java_parity/run_parity.py"), "30"],
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "identical" in proc.stdout
