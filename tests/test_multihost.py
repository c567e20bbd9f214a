"""Multi-host (DCN-tier) dryrun: two-process jax.distributed over CPU.

Keeps SURVEY §5's "multi-host later via jax.distributed.initialize" promise
honest (VERDICT r4 next #8): the single-host sharded-index paths and a
data-parallel train step must run unchanged on a global mesh spanning two
processes (Gloo collectives standing in for DCN).
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_multihost_dryrun():
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "dryrun_multihost.py"),
         "--port", "12901"],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-1000:]
    assert r.stdout.count("MULTIHOST OK") == 2, r.stdout[-3000:]
