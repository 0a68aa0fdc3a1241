"""C++ checkpoint data plane: build, read correctness, fallback behavior."""

import numpy as np
import pytest

from flux_fp8_api_tpu.utils import native_io
from flux_fp8_api_tpu.utils.safetensors_io import SafetensorsFile, save_safetensors


class TestNativeIO:
    def test_library_builds(self):
        lib = native_io.get_lib()
        assert lib is not None, "g++ build of native/stload.cpp failed"

    def test_parallel_read_matches_file(self, tmp_path):
        path = tmp_path / "blob.bin"
        data = np.random.RandomState(0).bytes(3 * 1024 * 1024)
        path.write_bytes(data)
        out = native_io.parallel_read(str(path), 0, len(data), n_threads=4)
        assert out is not None
        assert out.tobytes() == data

    def test_parallel_read_with_offset(self, tmp_path):
        path = tmp_path / "blob.bin"
        data = bytes(range(256)) * 4096
        path.write_bytes(data)
        out = native_io.parallel_read(str(path), 1000, 5000, n_threads=2)
        assert out.tobytes() == data[1000:6000]

    def test_missing_file_raises(self):
        if native_io.get_lib() is None:
            pytest.skip("native lib unavailable")
        with pytest.raises(OSError):
            native_io.parallel_read("/nonexistent/x.bin", 0, 10)

    def test_prefetch(self, tmp_path):
        path = tmp_path / "p.bin"
        path.write_bytes(b"x" * 1024)
        native_io.prefetch(str(path))  # must not raise

    def test_safetensors_native_path_equals_mmap(self, tmp_path):
        # force the native branch by lowering the threshold
        import flux_fp8_api_tpu.utils.safetensors_io as sio

        path = str(tmp_path / "t.safetensors")
        tensors = {"w": np.random.RandomState(1).randn(512, 257).astype(np.float32)}
        save_safetensors(path, tensors)
        old = sio._NATIVE_READ_THRESHOLD
        sio._NATIVE_READ_THRESHOLD = 1
        try:
            f_native = SafetensorsFile(path, use_native=True)
            f_mmap = SafetensorsFile(path, use_native=False)
            np.testing.assert_array_equal(f_native.get("w"), f_mmap.get("w"))
            np.testing.assert_array_equal(f_native.get("w"), tensors["w"])
        finally:
            sio._NATIVE_READ_THRESHOLD = old
