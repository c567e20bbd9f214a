"""Driver-bench outage degradation (VERDICT r3 #7, r4 weak #2).

`bench.py` must emit a parseable structured marker — not a stack trace —
when the TPU backend is unavailable, so BENCH_r{N}.json separates
infrastructure outages from code regressions. The round-3 outage mode was a
HANG (tunnel accepted nothing), so the probe runs in a subprocess under a
hard timeout.

Round-4 lesson: tests that relied on live tunnel state (`JAX_PLATFORMS=tpu`
expecting failure) flip when the tunnel comes BACK, because the axon
sitecustomize overrides the env var. An outage test must SIMULATE the
outage: `CRS_TPU_BENCH_PROBE_CMD` swaps the probe subprocess for a stub, so
both flavors (fail-fast and hang) reproduce regardless of infrastructure.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BENCH = REPO / "bench.py"


def _run_bench(env_overrides):
    env = dict(os.environ)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, str(BENCH)],
        capture_output=True, text=True, timeout=180, env=env, cwd=str(REPO),
    )


def _skipped_doc(r):
    assert r.returncode == 0, r.stderr[-2000:]
    doc = json.loads(r.stdout.strip().splitlines()[-1])
    assert doc["skipped"] is True
    assert doc["reason"].startswith("tpu-unavailable")
    assert doc["metric"] == "rag_retrieval_latency"
    assert doc["value"] is None and doc["vs_baseline"] is None
    return doc


def test_bench_emits_skipped_marker_on_failfast_outage():
    # Fail-fast flavor: the probe subprocess exits non-zero (backend init
    # raises). bench must print ONE JSON marker line and exit 0.
    probe = f"{sys.executable} -c 'raise SystemExit(1)'"
    _skipped_doc(_run_bench({"CRS_TPU_BENCH_PROBE_CMD": probe,
                             "CRS_TPU_BENCH_PROBE_TIMEOUT": "60"}))


def test_bench_probe_hang_counts_as_outage_without_double_timeout():
    # Hang flavor: the probe never returns. bench must degrade after ONE
    # timeout — retrying a hang just doubles detection latency (ADVICE r4).
    probe = f"{sys.executable} -c 'import time; time.sleep(600)'"
    t0 = time.perf_counter()
    _skipped_doc(_run_bench({"CRS_TPU_BENCH_PROBE_CMD": probe,
                             "CRS_TPU_BENCH_PROBE_TIMEOUT": "3"}))
    elapsed = time.perf_counter() - t0
    assert elapsed < 30, f"hang probe took {elapsed:.1f}s — retried after timeout?"
