"""Plumbing test for bench_cache.py (the step-cache speed/SSIM artifact): tiny-arch
mode must emit one well-formed JSON row per policy plus a summary line. The real
numbers are measured on TPU and committed as BENCH_CACHE_r5.json."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestBenchCachePlumbing:
    def test_tiny_run_emits_policy_rows(self):
        env = dict(os.environ, BENCH_TINY="1", PYTHONPATH=REPO)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench_cache.py")],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        lines = [json.loads(l) for l in proc.stdout.strip().splitlines()]
        rows = [l for l in lines if "policy" in l]
        summary = lines[-1]
        assert rows[0]["policy"] == "uncached"
        assert rows[0]["ssim_vs_uncached"] == 1.0
        by_name = {r["policy"]: r for r in rows}
        # 8 tiny steps, warmup=2/tail=1: interval2 evals {0,1,7}∪{0,2,4,6} = 6
        assert by_name["interval2"]["evals"] == 6
        assert by_name["interval3"]["evals"] == 5  # {0,1,7}∪{0,3,6}
        for r in rows:
            assert 0 < r["evals"] <= 8
            assert -1.0 <= r["ssim_vs_uncached"] <= 1.0
        assert summary["unit"] == "it/s-effective"
        assert summary["detail"]["rows"] == rows[1:]
