"""End-to-end run of tools/bench_pq_serving.py at toy scale (CHUNK patched
to 10k so the interpret-mode kernel stays fast). Covers the round-4 paths
that only a real run exercises: the codes cache roundtrip, the aniso cache
guard, and the disk-backed memmap-mirror backfill used by the 100M suite
step (pq100m_host)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture()
def bps(monkeypatch):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import bench_pq_serving as mod

    monkeypatch.setattr(mod, "CHUNK", 10_000)
    return mod


def _run(mod, monkeypatch, capsys, extra):
    argv = ["bps", "--rows", "10000", "--dim", "64", "--centers", "64",
            "--batch", "8", "--subspaces", "8", "--coarse", "256",
            "--block-size", "512", "--cand", "50", "--cpu"] + extra
    monkeypatch.setattr(sys, "argv", argv)
    mod.main()
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_serving_bench_cache_and_mmap_backfill(bps, monkeypatch, capsys,
                                               tmp_path):
    cache = str(tmp_path / "codes.npz")
    # 1. fresh run, NO host mirror — writes the cache without one
    r1 = _run(bps, monkeypatch, capsys,
              ["--no-host-mirror", "--codes-cache", cache])
    assert r1["rows"] == 10_000 and "recall_at_k_none" in r1
    assert Path(cache).exists()

    # 2. rerun from cache, host mirror via memmap — exercises the backfill
    mm = str(tmp_path / "mirror")
    r2 = _run(bps, monkeypatch, capsys,
              ["--host-mirror", "--codes-cache", cache, "--mirror-mmap", mm])
    assert Path(mm + ".codes.i8").exists()
    assert r2["recall_at_k_host"] >= r2["recall_at_k_none"] - 1e-9
    assert r2["recall_at_k_host"] >= 0.5  # toy corpus, rescore must recover a lot

    # 3. rerun again — memmap files now load directly (no backfill output)
    r3 = _run(bps, monkeypatch, capsys,
              ["--host-mirror", "--codes-cache", cache, "--mirror-mmap", mm])
    assert abs(r3["recall_at_k_host"] - r2["recall_at_k_host"]) < 1e-9

    # 4. aniso cache guard: asking for a different eta must refuse the cache
    with pytest.raises(AssertionError, match="aniso_eta"):
        _run(bps, monkeypatch, capsys,
             ["--no-host-mirror", "--codes-cache", cache,
              "--aniso-eta", "auto"])
