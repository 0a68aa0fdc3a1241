"""Test env: force CPU with 8 virtual devices so sharding tests run without TPUs.

Must run before jax initializes a backend — pytest imports conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The TPU image's sitecustomize registers the axon TPU backend and sets
# jax_platforms programmatically, which beats the env var — override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "xla_force_host_platform_device_count=8 not applied"


# ------------------------------------------------------------------ smoke subset
#
# The full suite is the merge gate (~56 min serial on the 8-device CPU mesh).
# `pytest -m "not slow"` is the smoke subset (measured 17:45 serial on this 1-CPU
# box; scales with -n workers): every module still runs, but the heavyweight
# e2e/calibration/mesh/trainer classes below are skipped.
# Curated from `--durations` of the full run; one place to maintain.
# pytest-xdist also works for the FULL suite (`-n 4`) — each worker gets its own
# 8-device virtual mesh; server tests bind ephemeral ports so they don't collide.

_SLOW_PREFIXES = (
    "test_fidelity.py::TestQuantFidelity",
    "test_parallel.py::TestGraftEntry",
    "test_parallel.py::TestTrainStateCheckpoint",
    "test_parallel.py::TestMeshServing",
    "test_parallel.py::TestTPCollectiveBudget",
    "test_parallel.py::TestTrainStep",
    "test_parallel.py::TestRemat",
    "test_parallel.py::TestOptaxTrainStep",
    "test_parallel.py::TestSequenceParallelAttention",
    "test_pipeline.py::TestServingPrecompile",
    "test_pipeline.py::TestCalibrationInPipeline",
    "test_pipeline.py::TestGenerate::test_num_images",
    "test_pipeline.py::TestGenerate::test_img2img",
    "test_cli.py::TestSavePrequantizedFlag",
    "test_configs.py::TestPrequantizedPipeline",
    "test_lora_train.py::TestTimestepSampling",
    "test_lora_train.py::TestLoraTraining",
    "test_lora_train.py::TestExportRoundTrip",
    "test_train_lora_cli.py::TestTrainerCli",
    "test_pp.py::TestPPBackward",
    "test_pp.py::TestPPServing",
    "test_edge_cases.py::TestCalibrationAcrossGenerates",
    "test_text_encoders.py::TestT5XXLShapeTierFidelity",
    "test_fidelity_full_plumbing.py::TestOrchestratorSubprocess",
    "test_bench_all.py::TestBenchAllPlumbing",
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        nid = item.nodeid.replace("tests/", "", 1)
        if nid.startswith(_SLOW_PREFIXES):
            item.add_marker(pytest.mark.slow)
