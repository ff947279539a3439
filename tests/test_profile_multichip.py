"""Smoke test for the multi-chip overlap profiler (VERDICT r4 next #9).

The real measurement needs P>=2 TPU chips (docs/OVERLAP.md); here the
harness runs end-to-end on the virtual CPU mesh so silicon time is never
spent debugging the tooling: mesh build, sharded pack with a REAL
boundary halo, traced applications, chrome-trace parse, JSON emission.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_profiler_harness_end_to_end(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts",
                                      "profile_multichip.py"),
         "--parts", "4", "--vertices", "8192", "--feat", "32",
         "--reps", "2", "--dir", str(tmp_path / "trace"),
         "--platform", "cpu", "--devices", "8"],
        capture_output=True, text=True, cwd=ROOT, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # a real boundary exchange must exist or the profile is vacuous
    # (VERDICT r4 weak #2)
    assert out["halo_rows"] > 0
    assert out["apply_ms"] > 0
    # trace parse ran (CPU lowers no collective-permute custom calls;
    # the field must still be present and well-formed)
    assert "collective_events" in out and "trace_file" in out


def test_interval_union():
    from scripts.profile_multichip import _intervals_union

    assert _intervals_union([]) == 0.0
    assert _intervals_union([(0, 10), (5, 15), (20, 25)]) == 20.0
    assert _intervals_union([(0, 1), (1, 2)]) == 2.0
