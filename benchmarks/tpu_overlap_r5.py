"""Round-5 overlap-split cost DECOMPOSITION (VERDICT r4 #3).

The ICI-overlap split (interior call + 4 seam-band calls) measured +52%
over the serial sweep post-relaxation (overlap_r4c.json: fluct 1393.5
serial vs 914.3 force) and the residual was ASSERTED to be "fundamental
band ext-read amplification + per-launch overhead" without an A/B
separating the two.  This script decomposes the penalty:

  serial        — overlap=False (baseline, 1 launch/sweep)
  force         — overlap='force', all 4 bands (5 launches/sweep)
  force_k0      — SPLIT_DEBUG=0: interior call only (1 launch, shrunken
                  (X-2px)(Y-16) window; physics-wrong, timing-only)
  force_k2      — SPLIT_DEBUG=2: interior + the 2 thin x bands
  launch_us     — micro: per-launch overhead of a minimal pallas_call
                  (copy (8,128)), 400 launches back-to-back

Derived per case (ms/step at 256^3):
  d_interior = t(force_k0) - t(serial)      window/structure cost
  d_xbands   = t(force_k2) - t(force_k0)    2 thin x-band launches+work
  d_ybands   = t(force)    - t(force_k2)    2 full-width y-band calls
  launch share = 2 * launch_us vs d_xbands / d_ybands
  noise share  = fluct marginal - determ marginal per component

Run: python benchmarks/tpu_retry.py --init-window 300 --timeout 3600 -- \
         python benchmarks/tpu_overlap_r5.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bflbm_tpu.config import LBMParams  # noqa: E402
from bflbm_tpu.kernels import session  # noqa: E402
from bflbm_tpu.models import binary_fluid as model  # noqa: E402
from bflbm_tpu.parallel import kernel as kernel_par  # noqa: E402
from bflbm_tpu.parallel import mesh as mesh_lib  # noqa: E402
from bflbm_tpu.utils.timing import fetch_scalar  # noqa: E402

SHAPE = (256, 256, 256)
CELLS = float(np.prod(SHAPE))
N = 100
t0 = time.time()
results = {}
mesh = mesh_lib.make_mesh((1, 1, 1))


def bench(label, params, overlap, k=None):
    kernel_par.SPLIT_DEBUG = k
    try:
        st = model.init_mixture(SHAPE, params, dtype=jnp.float32)
        sess = session.ShardedSession(mesh, params, SHAPE,
                                      overlap=overlap, block=2,
                                      noise_dist="u8")
        pc = sess.enter(st)
        pc = sess.advance(pc, N)  # compile + warmup
        fetch_scalar(pc)
        best = 1e9
        for _ in range(3):
            tt = time.time()
            pc = sess.advance(pc, N)
            fetch_scalar(pc)
            best = min(best, time.time() - tt)
        results[label] = round(CELLS * N / best / 1e6, 1)
        results[label + " ms"] = round(best / N * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        results[label] = f"FAIL: {type(e).__name__}: {e}"[:160]
    finally:
        kernel_par.SPLIT_DEBUG = None
    print(json.dumps({label: results[label],
                      "t": round(time.time() - t0, 1)}), flush=True)


def launch_micro():
    """Per-launch overhead: minimal pallas kernel (copy one (8, 128)
    tile), 400 sequential launches under one jit."""
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def one(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    @jax.jit
    def many(x):
        def body(c, _):
            return one(c), None
        c, _ = jax.lax.scan(body, x, None, length=400)
        return c

    x = jnp.zeros((8, 128), jnp.float32)
    fetch_scalar(many(x))
    best = 1e9
    for _ in range(3):
        tt = time.time()
        fetch_scalar(many(x))
        best = min(best, time.time() - tt)
    results["launch_us"] = round(best / 400 * 1e6, 2)
    print(json.dumps({"launch_us": results["launch_us"]}), flush=True)


FL = LBMParams(alpha0=0.0, kBT=1e-5)
DM = LBMParams(alpha0=0.0, kBT=0.0)

launch_micro()
for pname, par in (("fluct", FL), ("determ", DM)):
    bench(f"{pname} serial", par, False)
    bench(f"{pname} force", par, "force")
    bench(f"{pname} force_k0", par, "force", k=0)
    bench(f"{pname} force_k2", par, "force", k=2)
    ms = {}
    for case in ("serial", "force", "force_k0", "force_k2"):
        v = results.get(f"{pname} {case} ms")
        if isinstance(v, float):
            ms[case] = v
    if len(ms) == 4:
        results[f"{pname} d_interior_ms"] = round(
            ms["force_k0"] - ms["serial"], 3)
        results[f"{pname} d_xbands_ms"] = round(
            ms["force_k2"] - ms["force_k0"], 3)
        results[f"{pname} d_ybands_ms"] = round(
            ms["force"] - ms["force_k2"], 3)

out = os.path.join(os.path.dirname(__file__), "results",
                   "overlap_r5.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("WROTE", out, flush=True)
