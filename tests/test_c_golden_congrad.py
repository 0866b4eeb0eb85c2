"""Cross-language golden test for the island-constrained barotropic CG.

golden/c_golden/congrad_golden.c independently implements the deflated
preconditioned CG with island-perimeter constraint reductions
(congrad.F:62-470 spec, ops/solvers.py congrad).  Both sides solve the
REAL 5-point streamfunction system (sfc5pt operator on the world
topography, sfforc curl forcing) from identical inputs; the converged
solutions must agree to solver-tolerance level and both must satisfy
the constrained residual equations.
"""

import os
import struct
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.models.ocean.model import make_ocean
from uvic_tpu.models.ocean.tropic import sfforc
from uvic_tpu.ops.solvers import congrad

HERE = os.path.dirname(os.path.abspath(__file__))
CDIR = os.path.join(HERE, "..", "golden", "c_golden")


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    exe = tmp_path_factory.mktemp("cgold") / "congrad_golden"
    src = os.path.join(CDIR, "congrad_golden.c")
    subprocess.run(["gcc", "-O2", "-std=c99", "-o", str(exe), src,
                    "-lm"], check=True)
    return str(exe)


def test_c_golden_congrad(binary, tmp_path):
    cfg = small_config(imt=40, jmt=34, km=8)
    m = make_ocean(cfg)
    g = m.params.grid
    jmt, imt = g.jmt, g.imt
    c2dtsf = 2.0 * 1800.0
    isl = m.isl
    assert isl.nisle >= 1   # island machinery actually exercised

    cf = np.asarray(m.cf_unit, np.float64) / c2dtsf

    # depth-averaged forcing: wind-stress-curl-like pattern over U cells
    yu = np.asarray(g.yu)
    zu = np.zeros((2, jmt, imt))
    zu[0] = 1.0e-4 * np.sin(np.deg2rad(3.0 * yu))[:, None]
    zu[1] = 3.0e-5 * np.cos(np.deg2rad(2.0 * yu))[:, None] \
        * np.sin(np.linspace(0, 4 * np.pi, imt))[None, :]
    zu *= np.asarray(m.umask)[0][None]
    forc = np.asarray(sfforc(jnp.asarray(zu), jnp.asarray(g.dxu),
                             jnp.asarray(g.dyu), jnp.asarray(g.csu)),
                      np.float64)
    guess = np.zeros((jmt, imt))

    # stage 1: asymptotic JAX solution fixes the tolerance scale
    x_ref, iters_ref, _, _ = congrad(jnp.asarray(cf), jnp.asarray(guess),
                                     jnp.asarray(forc), isl, 0.0, 300,
                                     True)
    scale = float(jnp.abs(x_ref).max())
    assert scale > 0.0
    tol = 1.0e-8 * scale

    # stage 2: both implementations solve with the same tol
    x_j, it_j, est_j, conv_j = congrad(
        jnp.asarray(cf), jnp.asarray(guess), jnp.asarray(forc), isl,
        tol, 300, True)
    assert bool(conv_j) and int(it_j) > 5

    blob = tmp_path / "cg_in.bin"
    with open(blob, "wb") as f:
        f.write(struct.pack("<5i", jmt, imt, isl.nisle, isl.imain, 300))
        f.write(struct.pack("<d", tol))
        for a in (cf, guess, forc,
                  np.asarray(isl.perim_id, np.float64),
                  np.asarray(isl.counts, np.float64)):
            f.write(np.ascontiguousarray(a, dtype="<f8").tobytes())
    out = tmp_path / "cg_out.bin"
    subprocess.run([binary, str(blob), str(out)], check=True)
    raw = np.fromfile(out, dtype="<f8")
    x_c = raw[:jmt * imt].reshape(jmt, imt)
    it_c, conv_c = raw[jmt * imt], raw[jmt * imt + 1]
    assert conv_c == 1.0 and it_c > 5

    # solutions agree to solver-tolerance level (CG round-off paths
    # differ via reduction order, so the bound is tol-scale, not ulp)
    assert np.abs(np.asarray(x_j) - x_c).max() < 100.0 * tol, \
        (np.abs(np.asarray(x_j) - x_c).max(), tol)

    # independent fixed-point check: seeded with the C solution, the
    # JAX solver must accept it at once (the remaining residual lies in
    # the operator's null space — one constant mode plus one mode per
    # land mass — which no iteration can or should reduce)
    _, it_fp, _, conv_fp = congrad(
        jnp.asarray(cf), jnp.asarray(x_c), jnp.asarray(forc), isl,
        tol, 300, True)
    assert bool(conv_fp) and int(it_fp) <= 2, (int(it_fp),)
