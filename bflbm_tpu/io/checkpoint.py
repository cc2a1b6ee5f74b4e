"""Checkpoint / resume of (f, g, rng key, step).

The reference writes raw populations as end-of-run plotfiles
``f_checkpoint*/g_checkpoint*`` (main_run_job.cpp:400-409) and resumes by
re-reading them plus a re-bootstrap (LBM_init, LBM_binary.H:632-661); the
RNG stream is *not* part of the checkpoint there (noise continuity breaks
across restarts).  Here the full state pytree including the threefry key
round-trips, so a restarted run reproduces the unbroken trajectory
bit-for-bit.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..state import SimState

_META = "meta.json"


def save_state(path: str, state: SimState, extra: Optional[dict] = None) -> str:
    """Write the state to ``<path>.npz`` (+ a small JSON sidecar)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    f, g, key, step = jax.device_get((state.f, state.g, state.key, state.step))
    np.savez(path + ".npz", f=f, g=g, key=np.asarray(key),
             step=np.asarray(step))
    meta = {"step": int(step), "shape": list(f.shape[1:]),
            "dtype": str(f.dtype)}
    if extra:
        meta.update(extra)
    with open(path + ".json", "w") as fh:
        json.dump(meta, fh)
    return path + ".npz"


def load_state(path: str) -> SimState:
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as d:
        return SimState(
            f=jnp.asarray(d["f"]), g=jnp.asarray(d["g"]),
            key=jnp.asarray(d["key"]),
            step=jnp.asarray(d["step"], jnp.int32),
        )


def save_equilibrium(path: str, rho: np.ndarray, phi: np.ndarray,
                     rho_tot: np.ndarray) -> str:
    """Store the time-averaged equilibrium state artifact — the reference's
    ``equilibrium_{rho,phi,rhot}`` plotfiles (main_run_job.cpp:428-439)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path + ".npz", rho=np.asarray(rho), phi=np.asarray(phi),
             rho_tot=np.asarray(rho_tot))
    return path + ".npz"


def load_equilibrium(path: str):
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as d:
        return d["rho"], d["phi"], d["rho_tot"]


# ---------------------------------------------------------------------------
# Orbax variants — for multi-host / sharded states.  The npz path above
# funnels through host 0 (jax.device_get materializes the full array);
# orbax writes each shard from the host that owns it and restores with
# the target sharding, which is the correct multi-host protocol.
# ---------------------------------------------------------------------------

def save_state_orbax(path: str, state: SimState) -> str:
    """Write the state pytree with orbax (sharded, multi-host safe)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path) + ".orbax"
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, {"f": state.f, "g": state.g, "key": state.key,
                      "step": state.step}, force=True)
    return path


def load_state_orbax(path: str, shardings: Optional[dict] = None
                     ) -> SimState:
    """Restore an orbax checkpoint; `shardings` optionally maps
    {'f','g','key','step'} to jax.sharding.Sharding for direct sharded
    restore (no host-0 funnel)."""
    import orbax.checkpoint as ocp

    if not path.endswith(".orbax"):
        path = path + ".orbax"
    ckptr = ocp.PyTreeCheckpointer()
    if shardings:
        restore_args = {k: ocp.ArrayRestoreArgs(sharding=s)
                        for k, s in shardings.items()}
        d = ckptr.restore(path, restore_args=restore_args)
    else:
        d = ckptr.restore(path)
    return SimState(f=jnp.asarray(d["f"]), g=jnp.asarray(d["g"]),
                    key=jnp.asarray(d["key"]),
                    step=jnp.asarray(d["step"], jnp.int32))
