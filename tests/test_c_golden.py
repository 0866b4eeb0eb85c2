"""Cross-language golden trajectory tests.

golden/c_golden/tracer_golden.c is an independent C implementation of
the exact discrete tracer-step spec (tracer.F:678-916, adv_vel.F:1-253,
invtri.F:1-115 fully implicit, convect.F:52-89, setbcx) for BOTH the
centered scheme and the flagship FCT scheme (Zalesak flux-corrected
transport, tracer_adv_flx.F:376-1005, dlm1/dlm2 delimiters + the
O_fct_3d combined delimiter).  Both implementations consume
bitwise-identical constants from one binary blob; after N leapfrog
steps the trajectories must agree to accumulation-of-roundoff
tolerance.  This is the closest available stand-in for a golden-run
acceptance test (the image has no Fortran compiler), and correctness
evidence that is not JAX-vs-JAX.
"""

import os
import struct
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.models.ocean.model import make_ocean
from uvic_tpu.models.ocean.kernels import adv_vel, tracer_step
from uvic_tpu.ops.convection import convct_ncon
from uvic_tpu.ops.stencil import setbcx

HERE = os.path.dirname(os.path.abspath(__file__))
CDIR = os.path.join(HERE, "..", "golden", "c_golden")


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    exe = tmp_path_factory.mktemp("cgold") / "tracer_golden"
    src = os.path.join(CDIR, "tracer_golden.c")
    subprocess.run(["gcc", "-O2", "-std=c99", "-o", str(exe), src,
                    "-lm"], check=True)
    return str(exe)


SCHEME_ID = {"centered": 0, "fct": 1, "fct_dlm2": 2}


def _run_case(binary, tmp_path, scheme, fct3d=False, nsteps=10, ncon=2):
    cfg = small_config(imt=40, jmt=34, km=8)
    m = make_ocean(cfg)
    g, bag = m.params.grid, m.g
    nt, km, jmt, imt = 2, g.km, g.jmt, g.imt
    c2dtts = 2.0 * 21600.0
    ah = cfg.ocean.ah

    rng = np.random.default_rng(7)
    tmask = np.asarray(m.tmask)
    umask = np.asarray(m.umask)

    # stratified T + an unstable patch (decisive convection triggers)
    # + a sharp front (decisive FCT limiter triggers), perturbed S
    t0 = np.zeros((nt, km, jmt, imt))
    t0[0] = (18.0 * np.exp(-np.asarray(g.zt) / 800e2))[:, None, None]
    t0[0, 0, 10:14, 8:14] = 2.0      # cold over warm -> convection
    t0[0, :3, 18:22, 20:28] = 0.5    # sharp front -> limiter active
    t0[1] = 1e-3 * rng.normal(size=(km, jmt, imt))
    t0 *= tmask
    t0 = np.asarray(setbcx(jnp.asarray(t0), True))

    u = 5.0 * np.cos(np.deg2rad(np.asarray(g.yu)))[None, :, None] \
        * np.ones((km, jmt, imt))
    v = 2.0 * np.sin(np.deg2rad(2 * np.asarray(g.yu)))[None, :, None] \
        * np.ones((km, jmt, imt))
    u = np.asarray(setbcx(jnp.asarray(u * umask), True))
    v = np.asarray(setbcx(jnp.asarray(v * umask), True))

    stf = np.zeros((nt, jmt, imt))
    stf[0] = 2e-5 * np.cos(np.deg2rad(np.asarray(g.yt)))[:, None]
    stf[1] = -1e-8
    stf *= tmask[0]
    btf = np.zeros((nt, jmt, imt))

    diff_cbt = np.asarray(m.diff_cbt)
    kmt = np.asarray(m.kmt)

    # ---- write the blob --------------------------------------------------
    def arrs():
        yield np.asarray(g.dxu)
        yield np.asarray(g.dyu)
        yield np.asarray(g.csu)
        yield np.asarray(g.dxt2r)
        yield np.asarray(g.dyt2r)
        yield np.asarray(g.dxtr)
        yield np.asarray(g.dytr)
        yield np.asarray(g.cstr)
        yield np.asarray(g.dzt)
        yield np.asarray(bag.cstdxt2r)
        yield np.asarray(bag.cstdyt2r)
        yield np.asarray(g.dzt2r)
        yield np.asarray(bag.cstdxur)
        yield np.asarray(bag.cstdxtr)
        yield np.asarray(m.params.ahc_north)
        yield np.asarray(m.params.ahc_south)
        yield np.asarray(g.dztr)
        yield np.asarray(g.dztur)
        yield np.asarray(g.dztlr)
        yield np.asarray(bag.dtxcel)
        yield np.asarray(m.dztxcl)
        yield np.asarray(m.eos_c)
        yield np.asarray(m.eos_to)
        yield np.asarray(m.eos_so)
        yield kmt.astype(np.float64)
        yield tmask
        yield diff_cbt
        yield u
        yield v
        yield stf
        yield btf
        yield t0          # t_tm1
        yield t0          # t_tau

    blob = tmp_path / ("in_%s%d.bin" % (scheme, int(fct3d)))
    with open(blob, "wb") as f:
        f.write(struct.pack("<8i", nt, km, jmt, imt, nsteps, ncon,
                            SCHEME_ID[scheme], int(fct3d)))
        f.write(struct.pack("<2d", c2dtts, ah))
        for a in arrs():
            f.write(np.ascontiguousarray(a, dtype="<f8").tobytes())

    out = tmp_path / ("out_%s%d.bin" % (scheme, int(fct3d)))
    subprocess.run([binary, str(blob), str(out)], check=True)
    t_c = np.fromfile(out, dtype="<f8").reshape(nt, km, jmt, imt)

    # ---- JAX trajectory with the same spec ------------------------------
    tj = jnp.asarray(t0)
    tm1, tau = tj, tj
    vet, vnt, vbt, *_ = adv_vel(jnp.asarray(u), jnp.asarray(v), bag, True)
    stf_j, btf_j = jnp.asarray(stf), jnp.asarray(btf)
    dcb_j = jnp.asarray(diff_cbt)
    jscheme = "fct" if scheme.startswith("fct") else scheme
    variant = "dlm2" if scheme == "fct_dlm2" else "dlm1"

    @jax.jit
    def step(tau, tm1):
        t_new = tracer_step(tau, tm1, vet, vnt, vbt, stf_j, btf_j, None,
                            dcb_j, m.kmt, m.tmask, bag, c2dtts,
                            jscheme, 1.0, True,
                            fct_variant=variant, fct3d=fct3d)
        t_new = convct_ncon(t_new, m.kmt, m.eos_c, m.eos_to, m.eos_so,
                            m.dztxcl, ncon)
        return setbcx(t_new, True)

    for _ in range(nsteps):
        tau, tm1 = step(tau, tm1), tau

    t_j = np.asarray(tau)
    assert np.isfinite(t_c).all() and np.isfinite(t_j).all()
    # non-vacuity: the trajectory is active (advection moved tracer,
    # convection fired somewhere)
    assert np.abs(t_j[0]).max() > 1.0
    assert np.abs(t_j - t0).max() > 1e-3
    return t_j, t_c, t0


def test_c_golden_trajectory(binary, tmp_path):
    """Centered scheme + invtri + ncon convection (original anchor)."""
    t_j, t_c, _ = _run_case(binary, tmp_path, "centered")
    np.testing.assert_allclose(t_j, t_c, rtol=1e-9, atol=1e-12)


def test_c_golden_fct_dlm1(binary, tmp_path):
    """Flagship FCT (O_fct + dlm1): the configured default advection
    (tracer_adv_flx.F:376-1005) pinned against the independent C twin."""
    t_j, t_c, _ = _run_case(binary, tmp_path, "fct")
    np.testing.assert_allclose(t_j, t_c, rtol=1e-9, atol=1e-12)


def test_c_golden_fct_dlm2_3d(binary, tmp_path):
    """FCT with the dlm2 delimiters + the O_fct_3d combined delimiter
    (tracer_adv_flx.F:659-666, 880-977)."""
    t_j, t_c, _ = _run_case(binary, tmp_path, "fct_dlm2", fct3d=True)
    np.testing.assert_allclose(t_j, t_c, rtol=1e-9, atol=1e-12)


def test_c_golden_fct_limiter_active(binary, tmp_path):
    """Non-vacuity: the FCT trajectory must differ from centered (the
    limiter actually clipped antidiffusive fluxes somewhere)."""
    t_fct, _, _ = _run_case(binary, tmp_path, "fct")
    t_cen, _, _ = _run_case(binary, tmp_path, "centered")
    assert np.abs(t_fct - t_cen).max() > 1e-6
