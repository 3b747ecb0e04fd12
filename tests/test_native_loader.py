"""Native C++ npy batch loader: build, correctness, dataset integration,
and a throughput sanity check against the numpy path."""
import os
import time

import numpy as np
import pytest

from bmnas_tpu.native import loader as nl


pytestmark = pytest.mark.quick  # fast subset: python -m pytest -m quick

@pytest.fixture(scope="module")
def built():
    if not nl.native_available():
        pytest.skip(f"native loader unavailable: {nl._lib_error}")
    return True


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("npys")
    rng = np.random.RandomState(0)
    arrays = []
    for i in range(32):
        a = rng.randn(16, 24, 3).astype(np.float32)
        np.save(d / f"a_{i:03d}.npy", a)
        arrays.append(a)
    return d, arrays


class TestNativeLoader:
    def test_round_trip(self, built, npy_dir):
        d, arrays = npy_dir
        ldr = nl.NativeNpyLoader(num_threads=4)
        paths = [str(d / f"a_{i:03d}.npy") for i in range(32)]
        out = ldr.load_batch(paths, (16, 24, 3))
        np.testing.assert_array_equal(out, np.stack(arrays))

    def test_missing_file_raises(self, built, npy_dir):
        d, _ = npy_dir
        ldr = nl.NativeNpyLoader(num_threads=2)
        with pytest.raises(IOError):
            ldr.load_batch([str(d / "nope.npy")], (16, 24, 3))

    def test_dataset_uses_native(self, built, tmp_path):
        from bmnas_tpu.data.mmimdb import MMIMDBDataset
        from bmnas_tpu.data.synthetic import make_mmimdb_synthetic
        make_mmimdb_synthetic(str(tmp_path), n_per_stage=8, image_hw=(16, 16))
        ds_native = MMIMDBDataset(str(tmp_path), "train", use_native=True)
        ds_numpy = MMIMDBDataset(str(tmp_path), "train", use_native=False)
        assert ds_native._native is not None
        b1 = next(iter(ds_native.batches(4, shuffle=False)))
        b2 = next(iter(ds_numpy.batches(4, shuffle=False)))
        for k in ("image", "text", "label", "mask"):
            np.testing.assert_allclose(b1[k], b2[k], rtol=1e-6)

    def test_throughput(self, built, tmp_path):
        """Native loader should not be slower than per-file np.load."""
        rng = np.random.RandomState(1)
        n = 200
        shape = (64, 64, 3)
        paths = []
        for i in range(n):
            p = str(tmp_path / f"t_{i:04d}.npy")
            np.save(p, rng.randn(*shape).astype(np.float32))
            paths.append(p)
        ldr = nl.NativeNpyLoader(num_threads=8)
        # warm the page cache and the thread pool so both paths time pure
        # read+copy, not first-touch disk effects
        ldr.load_batch(paths, shape)
        [np.load(p) for p in paths]
        t0 = time.perf_counter()
        ldr.load_batch(paths, shape)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.stack([np.load(p) for p in paths])
        t_numpy = time.perf_counter() - t0
        assert t_native < t_numpy * 1.5, (t_native, t_numpy)


class TestNativeSkeletonParser:
    """C++ .skeleton parser == the Python oracle (data/ntu.py:61-79)."""

    def _write_skeleton(self, path, T=20, persons=2, nan_at=None):
        rng = np.random.RandomState(7)
        lines = [str(T)]
        for t in range(T):
            lines.append(str(persons))
            for p in range(persons):
                lines.append("72057594037944738 0 1 1 1 1 0 0.1 -0.2 2")
                lines.append("25")
                for j in range(25):
                    vals = [f"{rng.randn():.6f}" for _ in range(12)]
                    if nan_at == (t, p, j):
                        vals[1] = "nan"
                    lines.append(" ".join(vals))
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    def test_matches_python_oracle(self, tmp_path):
        pytest.importorskip("ctypes")
        from bmnas_tpu.data.ntu import get_3d_skeleton
        from bmnas_tpu.native.loader import NativeSkeletonParser
        p = str(tmp_path / "a.skeleton")
        self._write_skeleton(p, T=33, persons=2)
        got = NativeSkeletonParser().parse(p)
        np.testing.assert_array_equal(got, get_3d_skeleton(p))

    def test_nan_and_third_person_handling(self, tmp_path):
        from bmnas_tpu.data.ntu import get_3d_skeleton
        from bmnas_tpu.native.loader import NativeSkeletonParser
        p = str(tmp_path / "b.skeleton")
        # 3 persons (third consumed but ignored) + a NaN coordinate
        self._write_skeleton(p, T=5, persons=3, nan_at=(2, 1, 7))
        got = NativeSkeletonParser().parse(p)
        want = get_3d_skeleton(p)
        np.testing.assert_array_equal(got, want)
        assert got[1, 2, 7, 1] == 0.0  # nan -> 0 (np.nan_to_num parity)

    def test_dataset_falls_back_on_malformed(self, tmp_path):
        from bmnas_tpu.native.loader import NativeSkeletonParser
        p = str(tmp_path / "c.skeleton")
        with open(p, "w") as f:
            f.write("not a number\n")
        with pytest.raises(IOError):
            NativeSkeletonParser().parse(p)

    def test_short_joint_line_fails_not_shifts(self, tmp_path):
        """A truncated joint line must return an error (triggering the
        Python-oracle fallback), never silently consume the next line."""
        from bmnas_tpu.native.loader import NativeSkeletonParser
        p = str(tmp_path / "short.skeleton")
        lines = ["1", "1", "7 0 1 1 1 1 0 0.1 -0.2 2", "25"]
        for j in range(25):
            # joint 3 is truncated to two values
            lines.append("0.5 0.5" if j == 3 else
                         " ".join(["0.1"] * 12))
        with open(p, "w") as f:
            f.write("\n".join(lines) + "\n")
        with pytest.raises(IOError):
            NativeSkeletonParser().parse(p)
