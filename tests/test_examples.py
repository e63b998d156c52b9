"""The migration examples must actually run (each mirrors one reference
example program)."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
# example -> marker that proves its output table actually rendered
EXAMPLES = {
    "simple.py": "user_id",
    "script_update.py": "user_id",
    "snapshot.py": "user_id",
    "live_replication.py": "user_id",
    "corpus_pipeline.py": "per-source pack summary",
    "incremental_pipeline.py": "live rollup",
    "analytics.py": "joined_rows",
}


@pytest.mark.parametrize("name", sorted(EXAMPLES))
def test_example_runs(name):
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / name), "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert EXAMPLES[name] in proc.stdout  # the show() table rendered
