"""AMReX plotfile / VisMF IO (io/amrex.py): round trips + grammar.

The writer/reader pair targets the exact on-disk format the reference
produces and re-loads (AMReX_FileIO.H:18-113 via VisMF::Read); the
grammar fixtures below pin the x86 AMReX conventions (FAB real
descriptor, BoxArray listing, FabOnDisk offsets) so a format drift in
either direction fails loudly.
"""
import os

import numpy as np
import pytest

from bflbm_tpu.io import amrex
from bflbm_tpu.io import fields as fields_io
from bflbm_tpu.ops.hydro import HYDRO_NAMES


def _data(shape=(8, 6, 4), ncomp=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(ncomp,) + shape)


def test_multifab_roundtrip_single_box(tmp_path):
    d = _data()
    amrex.write_multifab(str(tmp_path / "Cell"), d)
    back, meta = amrex.read_multifab(str(tmp_path / "Cell"))
    np.testing.assert_array_equal(back, d)
    assert meta["ncomp"] == 3 and len(meta["boxes"]) == 1


def test_multifab_roundtrip_tiled(tmp_path):
    """BoxArray.maxSize-style decomposition (main_run_job.cpp:140-143)."""
    d = _data(shape=(8, 8, 8), ncomp=2)
    amrex.write_multifab(str(tmp_path / "Cell"), d, max_grid=4)
    back, meta = amrex.read_multifab(str(tmp_path / "Cell"))
    np.testing.assert_array_equal(back, d)
    assert len(meta["boxes"]) == 8


def test_plotfile_roundtrip(tmp_path):
    d = _data(shape=(6, 5, 4), ncomp=len(HYDRO_NAMES))
    p = str(tmp_path / "plt0000040")
    amrex.write_plotfile(p, d, HYDRO_NAMES, time=40.0, step=40)
    fields, meta = amrex.read_plotfile(p)
    assert meta["step"] == 40 and meta["time"] == 40.0
    assert list(meta["names"]) == list(HYDRO_NAMES)
    for i, n in enumerate(HYDRO_NAMES):
        np.testing.assert_array_equal(fields[n], d[i])


def test_read_frame_dispatches_on_plotfile_dir(tmp_path):
    d = _data(shape=(4, 4, 4), ncomp=len(HYDRO_NAMES))
    p = str(tmp_path / "plt0000010")
    amrex.write_plotfile(p, d, HYDRO_NAMES, step=10)
    out = fields_io.read_frame(p)
    assert int(out["step"]) == 10
    np.testing.assert_array_equal(out["rho"], d[0])


def test_analysis_frames_discovers_plotfiles(tmp_path):
    from bflbm_tpu import analysis

    d = _data(shape=(4, 4, 4), ncomp=len(HYDRO_NAMES))
    for step in (30, 10, 20):
        amrex.write_plotfile(str(tmp_path / f"plt{step:07d}"), d,
                             HYDRO_NAMES, step=step)
    frames = analysis._frames(str(tmp_path))
    assert [os.path.basename(f) for f in frames] == [
        "plt0000010", "plt0000020", "plt0000030"]


def test_fab_payload_layout(tmp_path):
    """x fastest, component slowest (Fortran FAB layout)."""
    d = np.arange(2 * 2 * 3 * 4, dtype=float).reshape(2, 2, 3, 4)
    amrex.write_multifab(str(tmp_path / "Cell"), d)
    raw = open(tmp_path / "Cell_D_00000", "rb").read()
    payload = np.frombuffer(raw[raw.index(b"\n") + 1:], "<f8")
    nx, ny, nz = 2, 3, 4
    for c in range(2):
        for z in range(nz):
            for y in range(ny):
                for x in range(nx):
                    flat = x + nx * (y + ny * (z + nz * c))
                    assert payload[flat] == d[c, x, y, z]


def test_reads_foreign_descriptors(tmp_path):
    """float32 FABs and big-endian byte order are accepted on read."""
    lo, hi = (0, 0, 0), (1, 1, 1)
    d = np.arange(8, dtype=np.float32).reshape(1, 2, 2, 2)
    head = (b"FAB ((4, (32 8 23 0 1 9 0 127)),(4, (1 2 3 4)))"
            b"((0,0,0) (1,1,1) (0,0,0)) 1\n")
    payload = np.ascontiguousarray(
        d.transpose(0, 3, 2, 1)).astype(">f4").tobytes()
    (tmp_path / "Cell_D_00000").write_bytes(head + payload)
    (tmp_path / "Cell_H").write_text(
        "1\n0\n1\n0\n(1 0\n((0,0,0) (1,1,1) (0,0,0))\n)\n1\n"
        "FabOnDisk: Cell_D_00000 0\n\n1,1\n0,\n\n1,1\n7,\n")
    back, meta = amrex.read_multifab(str(tmp_path / "Cell"))
    np.testing.assert_array_equal(back, d.astype(np.float64))


def test_reader_accepts_intvect_ngrow_and_ghost_cells(tmp_path):
    """Newer-AMReX '(1,1,1)' ngrow headers + FABs stored with ghost
    cells: the valid region must be extracted."""
    d = np.arange(2 * 2 * 2, dtype=float).reshape(1, 2, 2, 2)
    ghost = np.full((1, 4, 4, 4), -1.0)
    ghost[:, 1:3, 1:3, 1:3] = d
    head = (b"FAB ((8, (64 11 52 0 1 12 0 1023)),(8, (8 7 6 5 4 3 2 1)))"
            b"((-1,-1,-1) (2,2,2) (0,0,0)) 1\n")
    payload = np.ascontiguousarray(ghost.transpose(0, 3, 2, 1)).astype(
        "<f8").tobytes()
    (tmp_path / "Cell_D_00000").write_bytes(head + payload)
    (tmp_path / "Cell_H").write_text(
        "1\n0\n1\n(1,1,1)\n(1 0\n((0,0,0) (1,1,1) (0,0,0))\n)\n1\n"
        "FabOnDisk: Cell_D_00000 0\n\n1,1\n0,\n\n1,1\n7,\n")
    back, meta = amrex.read_multifab(str(tmp_path / "Cell"))
    assert meta["ngrow"] == 1
    np.testing.assert_array_equal(back, d)


def test_run_writes_amrex_frames(tmp_path):
    """End-to-end: run.py with plot_fmt='amrex' produces plotfile dirs
    the analysis CLI can read back."""
    from bflbm_tpu import analysis
    from bflbm_tpu import run as run_mod
    from bflbm_tpu.config import preset

    cfg = preset("mixture-eq").replace(
        shape=(8, 8, 8), nsteps=4, plot_int=2, print_int=0,
        plot_fmt="amrex", out_dir=str(tmp_path))
    run_mod.run(cfg)
    frames = analysis._frames(str(tmp_path))
    assert len(frames) >= 2 and all(os.path.isdir(f) for f in frames)
    out = analysis._read_any(frames[-1])
    assert abs(float(np.mean(out["rho"])) - 1.0) < 1e-6
