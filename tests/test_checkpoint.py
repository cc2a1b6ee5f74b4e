"""Checkpoint round-trips: npz (single-host) and orbax (sharded /
multi-host protocol).  Replaces the reference's f_checkpoint*/g_checkpoint*
plotfiles (main_run_job.cpp:400-409) — here the RNG key rides along."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bflbm_tpu.config import LBMParams
from bflbm_tpu.io import checkpoint as ckpt
from bflbm_tpu.models import binary_fluid as model


def _state():
    params = LBMParams(alpha0=1.5, kBT=1e-5, kappa=0.1,
                       rho_lo=0.1, rho_hi=3.0)
    return model.init_droplet((8, 8, 8), params, dtype=jnp.float32,
                              radius=0.3)


def test_npz_roundtrip():
    state = _state()
    with tempfile.TemporaryDirectory() as d:
        p = ckpt.save_state(os.path.join(d, "ck"), state,
                            extra={"note": "test"})
        back = ckpt.load_state(p)
    np.testing.assert_array_equal(np.asarray(back.f), np.asarray(state.f))
    np.testing.assert_array_equal(np.asarray(back.key),
                                  np.asarray(state.key))
    assert int(back.step) == int(state.step)


def test_orbax_roundtrip():
    pytest.importorskip("orbax.checkpoint")
    state = _state()
    with tempfile.TemporaryDirectory() as d:
        p = ckpt.save_state_orbax(os.path.join(d, "ck"), state)
        back = ckpt.load_state_orbax(p)
    np.testing.assert_array_equal(np.asarray(back.f), np.asarray(state.f))
    np.testing.assert_array_equal(np.asarray(back.key),
                                  np.asarray(state.key))
    assert int(back.step) == int(state.step)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_orbax_sharded_restore():
    """Restore directly into a mesh sharding (the multi-host path: each
    host reads only its shards)."""
    pytest.importorskip("orbax.checkpoint")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bflbm_tpu.parallel import mesh as mesh_lib

    params = LBMParams(alpha0=0.0, kBT=0.0)
    state = model.init_mixture((8, 16, 8), params, dtype=jnp.float32)
    mesh = mesh_lib.make_mesh((2, 4, 1))
    sh = NamedSharding(mesh, P(None, "x", "y", "z"))
    rep = NamedSharding(mesh, P())
    with tempfile.TemporaryDirectory() as d:
        p = ckpt.save_state_orbax(os.path.join(d, "ck"), state)
        back = ckpt.load_state_orbax(
            p, {"f": sh, "g": sh, "key": rep, "step": rep})
    assert back.f.sharding.is_equivalent_to(sh, back.f.ndim)
    np.testing.assert_array_equal(np.asarray(back.f), np.asarray(state.f))
