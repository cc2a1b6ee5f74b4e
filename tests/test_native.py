"""Native library (C++ snapshot I/O + quadratures) tests."""

import os
import tempfile

import numpy as np
import pytest

from bflbm_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_write_read_roundtrip():
    rng = np.random.default_rng(0)
    fields = {
        "rho": rng.normal(size=(8, 8, 8)).astype(np.float32),
        "phi": rng.normal(size=(8, 8, 8)).astype(np.float32),
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "snap.bflbm")
        native.write_fields(path, fields)
        back = native.read_fields(path)
        assert set(back) == {"rho", "phi"}
        for k in fields:
            np.testing.assert_array_equal(back[k], fields[k])


def test_async_writer():
    rng = np.random.default_rng(1)
    arrays = [rng.normal(size=(16, 16, 16)).astype(np.float32)
              for _ in range(4)]
    with tempfile.TemporaryDirectory() as d:
        with native.AsyncFieldWriter(nthreads=2) as w:
            for i, a in enumerate(arrays):
                w.submit(os.path.join(d, f"f{i}.bflbm"), ["x"], [a])
            w.flush()
        for i, a in enumerate(arrays):
            back = native.read_fields(os.path.join(d, f"f{i}.bflbm"))
            np.testing.assert_array_equal(back["x"], a)


def test_write_frame_via_async_writer():
    """run.py's async frame path: write_frame(writer=...) submits the
    22-field snapshot and read_frame round-trips after flush."""
    from bflbm_tpu.io import fields as fields_io
    from bflbm_tpu.ops.hydro import HYDRO_NAMES

    rng = np.random.default_rng(3)
    packed = rng.normal(size=(len(HYDRO_NAMES), 6, 6, 6)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        with native.AsyncFieldWriter(nthreads=1) as w:
            path = fields_io.write_frame(d, 7, packed, fmt="native",
                                         writer=w)
            w.flush()
            back = fields_io.read_frame(path)
        for i, n in enumerate(HYDRO_NAMES):
            np.testing.assert_array_equal(back[n], packed[i])


def test_corruption_detected():
    fields = {"rho": np.ones((4, 4, 4), np.float32)}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "snap.bflbm")
        native.write_fields(path, fields)
        raw = bytearray(open(path, "rb").read())
        raw[-5] ^= 0xFF  # flip a data byte
        open(path, "wb").write(bytes(raw))
        with pytest.raises(IOError):
            native.read_fields(path)


def test_sech_moment_matches_numpy():
    from scipy.integrate import quad

    for n, p, R, s in [(0, 2, 5.0, 1.0), (2, 2, 8.0, 0.7),
                       (2, 4, 6.0, 1.3), (4, 4, 10.0, 2.0)]:
        got = native.sech_moment(n, p, R, s, 40.0)
        want, _ = quad(lambda x: x ** n / np.cosh((x - R) / s) ** p,
                       0, 40.0, limit=200)
        np.testing.assert_allclose(got, want, rtol=1e-9)


def test_float64_roundtrip():
    fields = {"a": np.linspace(0, 1, 64).reshape(4, 4, 4)}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "s.bflbm")
        native.write_fields(path, fields)
        back = native.read_fields(path)
        assert back["a"].dtype == np.float64
        np.testing.assert_array_equal(back["a"], fields["a"])


def test_h5_frame_roundtrip():
    """Optional HDF5 export (reference GNUmakefile:24 USE_HDF5, compiled
    out there; first-class here when h5py is present)."""
    h5py = pytest.importorskip("h5py")  # noqa: F841
    from bflbm_tpu.io import fields as fields_io
    from bflbm_tpu.ops.hydro import HYDRO_NAMES

    rng = np.random.default_rng(4)
    packed = rng.normal(size=(len(HYDRO_NAMES), 5, 5, 5)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = fields_io.write_frame(d, 11, packed, fmt="h5")
        back = fields_io.read_frame(path)
    assert back["step"] == 11
    for i, n in enumerate(HYDRO_NAMES):
        np.testing.assert_array_equal(back[n], packed[i])
