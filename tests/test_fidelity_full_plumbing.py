"""Full-mode fidelity-gate plumbing on the FIDELITY_TINY toy (CPU).

The headline full-scale SSIM gate (``bench_fidelity.py full``, VERDICT r3 #1)
runs as chunked, resumable subprocess phases because the TPU tunnel client
retains sent bytes in host RSS for the life of a process (docs/PERF.md). These
tests validate that machinery at toy scale: chunked ground-truth resume is
bit-exact vs a single pass, a tier phase lands its SSIM in meta.json, the
report JSON carries the gate fields, and the subprocess orchestrator completes
end-to-end and is a cheap no-op on re-invocation.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "bench_fidelity.py")


@pytest.fixture()
def tiny_env(monkeypatch):
    """_full_cfg reads FIDELITY_TINY at call time, so in-process phase calls
    shrink to the hidden-64 toy (the conftest already forces the CPU backend)."""
    monkeypatch.setenv("FIDELITY_TINY", "1")


class TestChunkedPhases:
    STEPS = 4

    def _gt(self, bf, workdir, chunks):
        bf.phase_tree(str(workdir))
        for i0, i1 in chunks:
            bf.phase_gt(str(workdir), self.STEPS, i0, i1, 0.0)
        return np.load(os.path.join(str(workdir), "ref.npy"))

    def test_chunked_gt_bit_exact_vs_single_pass(self, tiny_env, tmp_path):
        import bench_fidelity as bf

        a = self._gt(bf, tmp_path / "a", [(0, 2), (2, 4)])
        b = self._gt(bf, tmp_path / "b", [(0, 4)])
        assert a.dtype == b.dtype and a.shape == b.shape
        assert np.array_equal(a, b), "chunked gt resume must be bit-exact"

    def test_tier_and_report(self, tiny_env, tmp_path, capsys):
        import bench_fidelity as bf

        wd = str(tmp_path / "w")
        bf.phase_tree(wd)
        bf.phase_gt(wd, self.STEPS, 0, self.STEPS, 0.0)
        bf.phase_tier(wd, self.STEPS, "int8")
        meta = bf._read_meta(wd)
        assert "int8" in meta["results"]
        assert meta["results"]["int8"] > 0.5  # toy arch, loose sanity bound
        assert meta["done_steps"] == self.STEPS
        capsys.readouterr()
        bf.phase_report(wd, self.STEPS, ["int8"])
        line = capsys.readouterr().out.strip().splitlines()[-1]
        rep = json.loads(line)
        assert rep["unit"] == "ssim"
        assert rep["gate"].startswith(">=0.95")
        assert set(rep["detail"]) == {"int8"}
        assert isinstance(rep["pass"], bool)
        assert "bf16_ground_truth_s" in rep["timings"]
        assert "missing_tiers" not in rep

    def test_report_tolerates_partial_tiers(self, tiny_env, tmp_path, capsys):
        """A crashed tier must not mean 'no JSON at all' (VERDICT r4 weak #3):
        the report covers completed tiers, lists the rest, and never claims the
        full gate. Also: --out persists the same line to a file."""
        import bench_fidelity as bf

        wd = str(tmp_path / "w")
        bf.phase_tree(wd)
        bf.phase_gt(wd, self.STEPS, 0, self.STEPS, 0.0)
        bf.phase_tier(wd, self.STEPS, "int8")
        capsys.readouterr()
        out_file = str(tmp_path / "report.json")
        bf.phase_report(wd, self.STEPS, ["fp8", "int8"], out_path=out_file)
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert set(rep["detail"]) == {"int8"}
        assert rep["missing_tiers"] == ["fp8"]
        assert rep["pass"] is False  # partial runs never pass the gate
        with open(out_file) as f:
            assert json.loads(f.read()) == rep
        # zero completed tiers is still an error, not an empty report
        with pytest.raises(SystemExit):
            bf.phase_report(wd, self.STEPS, ["fp8"])

    def test_gt_checkpoints_are_step_keyed_and_atomic(self, tiny_env, tmp_path):
        """latent_{N}.npy is the state after N steps and meta.done_steps always
        names an existing checkpoint (advisor r4: non-atomic latent.npy + stale
        done_steps could silently corrupt a resumed ground truth)."""
        import bench_fidelity as bf

        wd = str(tmp_path / "w")
        bf.phase_tree(wd)
        bf.phase_gt(wd, self.STEPS, 0, 2, 0.0)
        meta = bf._read_meta(wd)
        assert meta["done_steps"] == 2
        assert os.path.exists(bf._latent_path(wd, 2))
        assert not os.path.exists(bf._latent_path(wd, 2) + ".tmp.npy")
        bf.phase_gt(wd, self.STEPS, 2, self.STEPS, 0.0)
        assert os.path.exists(bf._latent_path(wd, self.STEPS))
        assert bf._read_meta(wd)["done_steps"] == self.STEPS


class TestOrchestratorSubprocess:
    """End-to-end ``full`` orchestrator at toy scale (slow: spawns 5 python
    subprocesses, each paying the jax import). FIDELITY_TINY also forces the
    CPU backend inside bench_fidelity, so this never touches the TPU tunnel."""

    def _run(self, wd, timeout):
        env = dict(os.environ, FIDELITY_TINY="1")
        return subprocess.run(
            [sys.executable, SCRIPT, "full", "3", "int8",
             "--workdir", wd, "--chunk", "2"],
            env=env, capture_output=True, text=True, timeout=timeout, cwd=REPO,
        )

    def test_full_orchestrator_tiny_and_resume(self, tmp_path):
        wd = str(tmp_path / "wd")
        out = self._run(wd, timeout=900)
        assert out.returncode == 0, out.stderr[-2000:]
        rep = json.loads(out.stdout.strip().splitlines()[-1])
        assert rep["unit"] == "ssim" and "int8" in rep["detail"]
        # partial final chunk exercised: steps=3, chunk=2 -> gt [0,2) + [2,3)
        assert "+ gt 0 2" in out.stderr and "+ gt 2 3" in out.stderr
        # re-invocation resumes off the workdir: no tree/gt/tier re-runs,
        # straight to an identical report
        out2 = self._run(wd, timeout=300)
        assert out2.returncode == 0, out2.stderr[-2000:]
        assert "+ gt" not in out2.stderr and "+ tier" not in out2.stderr
        rep2 = json.loads(out2.stdout.strip().splitlines()[-1])
        assert rep2["detail"] == rep["detail"]
