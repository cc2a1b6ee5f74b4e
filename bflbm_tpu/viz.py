"""Quick-look visualization of run outputs (matplotlib).

Replaces the plotting layers of the reference's notebook suite
(Viewer / Visualization / Flat_Interface / Mixture plots):

    python -m bflbm_tpu.viz slice   --frame out/run/plt0000100.npz
    python -m bflbm_tpu.viz profile --frame ... [--axis 2]
    python -m bflbm_tpu.viz sk      --dir out/run
    python -m bflbm_tpu.viz series  --dir out/run --field rho

Each command writes a PNG next to the input (or --out).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def cmd_slice(args):
    from .io import fields as fio

    plt = _plt()
    d = fio.read_frame(args.frame)
    arr = d[args.field]
    idx = args.index if args.index is not None else arr.shape[args.axis] // 2
    sl = np.take(arr, idx, axis=args.axis)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(sl.T, origin="lower", cmap="viridis")
    fig.colorbar(im, ax=ax, label=args.field)
    ax.set_title(f"{args.field} slice axis={args.axis} idx={idx}")
    out = args.out or args.frame.rsplit(".", 1)[0] + f"_{args.field}.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    return out


def cmd_profile(args):
    from .io import fields as fio

    plt = _plt()
    d = fio.read_frame(args.frame)
    axes = tuple(a for a in range(3) if a != args.axis)
    fig, ax = plt.subplots(figsize=(6, 4))
    for f in ("rho", "phi"):
        ax.plot(d[f].mean(axis=axes), label=f)
    ax.set_xlabel("xyz"[args.axis])
    ax.set_ylabel("density")
    ax.legend()
    ax.grid(True)
    out = args.out or args.frame.rsplit(".", 1)[0] + "_profile.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    return out


def cmd_sk(args):
    from .observables import structfact as sf_lib

    plt = _plt()
    sfs = sorted(glob.glob(os.path.join(args.dir, "structfact*.npz")))
    with np.load(sfs[-1], allow_pickle=True) as d:
        sk = np.fft.ifftshift(d["s_k"], axes=(-3, -2, -1))
        names = [str(n) for n in d["names"]]
    fig, ax = plt.subplots(figsize=(7, 5))
    for name in ("rho*rho", "ufbarx*ufbarx", "ubx*ubx"):
        if name in names:
            k, s = sf_lib.radial_average(np.real(sk[names.index(name)]))
            ax.plot(k, s, "o-", ms=3, label=name)
    ax.set_xlabel("|k| (index units)")
    ax.set_ylabel("S(k)")
    ax.legend()
    ax.grid(True)
    out = args.out or os.path.join(args.dir, "sk.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    return out


def cmd_series(args):
    from .io import fields as fio
    from .observables import correlation as corr

    plt = _plt()
    frames = sorted(glob.glob(os.path.join(args.dir, "plt*.npz"))
                    + glob.glob(os.path.join(args.dir, "plt*.bflbm")))
    ts = corr.time_series([fio.read_frame(f) for f in frames], args.field)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(ts["step"], ts["mean"], label="mean")
    ax.fill_between(ts["step"], ts["mean"] - ts["std"],
                    ts["mean"] + ts["std"], alpha=0.3, label="+-std")
    ax.set_xlabel("step")
    ax.set_ylabel(args.field)
    ax.legend()
    ax.grid(True)
    out = args.out or os.path.join(args.dir, f"{args.field}_series.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("slice")
    p.add_argument("--frame", required=True)
    p.add_argument("--field", default="rho")
    p.add_argument("--axis", type=int, default=0)
    p.add_argument("--index", type=int, default=None)
    p.add_argument("--out", default=None)
    p = sub.add_parser("profile")
    p.add_argument("--frame", required=True)
    p.add_argument("--axis", type=int, default=2)
    p.add_argument("--out", default=None)
    p = sub.add_parser("sk")
    p.add_argument("--dir", required=True)
    p.add_argument("--out", default=None)
    p = sub.add_parser("series")
    p.add_argument("--dir", required=True)
    p.add_argument("--field", default="rho")
    p.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    fn = {"slice": cmd_slice, "profile": cmd_profile, "sk": cmd_sk,
          "series": cmd_series}
    print(fn[args.cmd](args))


if __name__ == "__main__":
    main()
