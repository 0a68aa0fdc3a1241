"""Plumbing test for bench_all.py (the resolution/tier table artifact, VERDICT
r4 #4/#8): the tiny-arch mode must produce a well-formed one-line JSON report
and honor --out. The real table is measured on TPU and committed as
BENCH_TABLE_r5.json."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestBenchAllPlumbing:
    def test_tiny_run_emits_table_json(self, tmp_path):
        out = str(tmp_path / "table.json")
        env = dict(os.environ, BENCH_TINY="1", PYTHONPATH=REPO)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench_all.py"), "--out", out],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = proc.stdout.strip().splitlines()[-1]
        rep = json.loads(line)
        assert rep["unit"] == "it/s"
        assert rep["value"] > 0
        assert rep["vs_baseline"] > 0
        rows = rep["detail"]["rows"]
        assert len(rows) == 1  # tiny mode runs the headline row only
        row = rows[0]
        assert row["tier"] == "fp8" and row["model"] == "flux-dev"
        assert row["it_s"] == rep["value"]
        assert row["s_per_image_denoise"] > 0
        with open(out) as f:
            assert json.loads(f.read()) == rep
