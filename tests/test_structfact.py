"""DFT + structure-factor machinery vs numpy.fft (the AMReX_DFT.H /
FHDeX StructFact replacement)."""

import jax.numpy as jnp
import numpy as np

from bflbm_tpu.observables import structfact as sf
from bflbm_tpu.ops import rfft


def test_fft3_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 12, 16))
    re, im = rfft.fft3(jnp.asarray(x))
    ref = np.fft.fftn(x)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-9)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-9)


def test_power_spectrum_parseval():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 8, 8))
    p = np.asarray(rfft.power_spectrum(jnp.asarray(x), remove_mean=False))
    # Parseval with unitary normalization: sum |X|^2 / N = sum x^2
    np.testing.assert_allclose(p.sum(), (x ** 2).sum(), rtol=1e-10)


def test_accumulate_matches_direct():
    rng = np.random.default_rng(2)
    frames = [rng.normal(size=(2, 6, 6, 6)) for _ in range(3)]
    pairs = [(0, 0), (1, 1), (0, 1)]
    st = sf.init_structfact(len(pairs), (6, 6, 6), jnp.float64)
    for fr in frames:
        st = sf.accumulate(st, jnp.asarray(fr), pairs)
    got = sf.finalize(st, zero_avg=False, shift=False)

    n = 6 ** 3
    want = np.zeros((3, 6, 6, 6), complex)
    for fr in frames:
        h = np.fft.fftn(fr, axes=(-3, -2, -1)) / np.sqrt(n)
        for p, (a, b) in enumerate(pairs):
            want[p] += h[a] * np.conj(h[b])
    want /= len(frames)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_radial_average_flat():
    s = np.ones((8, 8, 8))
    k, v = sf.radial_average(s)
    np.testing.assert_allclose(v, 1.0)
    assert (k > 0).all()
