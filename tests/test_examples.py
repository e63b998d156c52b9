"""The migration examples must actually run (each mirrors one reference
example program)."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = ["simple.py", "script_update.py", "snapshot.py", "live_replication.py"]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / name), "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "user_id" in proc.stdout  # the show() table rendered
