"""Cross-language golden trajectory for the isopycnal/GM tracer step.

golden/c_golden/isopyc_golden.c independently implements the flagship
mixing configuration: Redi small-angle tensor with slope-clip taper
(isopyc.F elements/ai_east/ai_north/ai_bottom), GM eddy-induced
advection (isopyc_adv), isoflux east/north/bottom additions, FCT
advection on the GM-augmented velocities, the aidif-split vertical
diffusion with K33 folded into the implicit coefficient, and ncon
convection.  Both sides consume one blob of bitwise-identical
constants; 8 leapfrog steps must agree to round-off accumulation.
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
from uvic_tpu.models.ocean.isopyc import compute_isopyc
from uvic_tpu.ops.convection import convct_ncon
from uvic_tpu.ops.stencil import setbcx

HERE = os.path.dirname(os.path.abspath(__file__))
CDIR = os.path.join(HERE, "..", "golden", "c_golden")


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    exe = tmp_path_factory.mktemp("cgold") / "isopyc_golden"
    src = os.path.join(CDIR, "isopyc_golden.c")
    subprocess.run(["gcc", "-O2", "-std=gnu99", "-o", str(exe), src,
                    "-lm"], check=True)
    return str(exe)


def test_c_golden_isopyc_gm_trajectory(binary, tmp_path):
    import dataclasses
    nsteps, ncon = 8, 2
    cfg = small_config(imt=40, jmt=34, km=8)
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=True, gent_mcwilliams=True,
        aniso_zonal=True))
    m = make_ocean(cfg)
    o = cfg.ocean
    g, bag = m.params.grid, m.g
    nt, km, jmt, imt = 2, g.km, g.jmt, g.imt
    c2dtts = 2.0 * 21600.0

    rng = np.random.default_rng(13)
    tmask = np.asarray(m.tmask)
    umask = np.asarray(m.umask)

    # laterally structured stratification: nonzero isopycnal slopes,
    # taper active where slopes exceed slmx; a cold patch for
    # convection and a front for the FCT limiter
    t0 = np.zeros((nt, km, jmt, imt))
    lat = np.asarray(g.yt)[:, None]
    t0[0] = ((16.0 * np.exp(-np.asarray(g.zt) / 800e2))[:, None, None]
             * (0.5 + 0.5 * np.cos(np.deg2rad(lat)))[None])
    t0[0, 0, 10:14, 8:14] = 2.0
    t0[0, :3, 18:22, 20:28] = 1.0
    t0[1] = 2e-4 * rng.normal(size=(km, jmt, imt))
    t0 *= tmask
    t0 = np.asarray(setbcx(jnp.asarray(t0), True))

    u = 4.0 * np.cos(np.deg2rad(np.asarray(g.yu)))[None, :, None] \
        * np.ones((km, jmt, imt))
    v = 1.5 * np.sin(np.deg2rad(2 * np.asarray(g.yu)))[None, :, None] \
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
    addisop = np.asarray(m.addisop)
    assert addisop.max() > 0.0           # equatorial zonal addition live

    def arrs():
        yield np.asarray(g.dxu)
        yield np.asarray(g.dyu)
        yield np.asarray(g.csu)
        yield np.asarray(g.cst)
        yield np.asarray(g.dxt)
        yield np.asarray(g.dyt)
        yield np.asarray(g.dxt2r)
        yield np.asarray(g.dyt2r)
        yield np.asarray(g.dxtr)
        yield np.asarray(g.dytr)
        yield np.asarray(g.cstr)
        yield np.asarray(g.dxur)
        yield np.asarray(g.dyur)
        yield np.asarray(g.dzt)
        yield np.asarray(g.dztr)
        yield np.asarray(g.dzt2r)
        yield np.asarray(g.dzw)              # km+1
        yield np.asarray(g.dzwr)[1:]         # dzwrB
        yield np.asarray(g.dztur)
        yield np.asarray(g.dztlr)
        yield np.asarray(bag.dtxcel)
        yield np.asarray(bag.cstdxt2r)
        yield np.asarray(bag.cstdyt2r)
        yield np.asarray(bag.cstdxur)
        yield np.asarray(bag.cstdxtr)
        yield np.asarray(m.dztxcl)
        yield addisop
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
        yield t0

    blob = tmp_path / "iso_in.bin"
    with open(blob, "wb") as f:
        f.write(struct.pack("<6i", nt, km, jmt, imt, nsteps, ncon))
        f.write(struct.pack("<6d", c2dtts, bag.ah, o.slmx, o.ahisop,
                            o.athkdf, o.aidif))
        for a in arrs():
            f.write(np.ascontiguousarray(a, dtype="<f8").tobytes())
    out = tmp_path / "iso_out.bin"
    subprocess.run([binary, str(blob), str(out)], check=True)
    t_c = np.fromfile(out, dtype="<f8").reshape(nt, km, jmt, imt)

    # ---- JAX trajectory --------------------------------------------------
    vet, vnt, vbt, *_ = adv_vel(jnp.asarray(u), jnp.asarray(v), bag, True)
    stf_j, btf_j = jnp.asarray(stf), jnp.asarray(btf)
    dcb0 = jnp.asarray(diff_cbt)

    @jax.jit
    def step(tau, tm1):
        iso = compute_isopyc(tm1, m.tmask, m.kmt, m.eos_c, m.eos_to,
                             m.eos_so, bag, o, True, addisop=m.addisop)
        t_new = tracer_step(tau, tm1, vet + iso.vetiso,
                            vnt + iso.vntiso, vbt + iso.vbtiso,
                            stf_j, btf_j, None, dcb0 + iso.K33,
                            m.kmt, m.tmask, bag, c2dtts, "fct",
                            o.aidif, True, iso=iso)
        t_new = convct_ncon(t_new, m.kmt, m.eos_c, m.eos_to, m.eos_so,
                            m.dztxcl, ncon)
        return setbcx(t_new, True)

    tau = tm1 = jnp.asarray(t0)
    for _ in range(nsteps):
        tau, tm1 = step(tau, tm1), tau

    t_j = np.asarray(tau)
    assert np.isfinite(t_c).all() and np.isfinite(t_j).all()
    assert np.abs(t_j - t0).max() > 1e-3      # trajectory active
    np.testing.assert_allclose(t_j, t_c, rtol=1e-9, atol=1e-12)


def test_c_golden_isopyc_gm_active(binary, tmp_path):
    """Non-vacuity: GM velocities and the Redi fluxes must actually be
    nonzero for the test stratification (checked on the JAX side — the
    trajectory agreement above is then evidence for the whole tensor)."""
    import dataclasses
    cfg = small_config(imt=40, jmt=34, km=8)
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=True, gent_mcwilliams=True,
        aniso_zonal=True))
    m = make_ocean(cfg)
    g, bag = m.params.grid, m.g
    lat = np.asarray(g.yt)[:, None]
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    t0[0] = ((16.0 * np.exp(-np.asarray(g.zt) / 800e2))[:, None, None]
             * (0.5 + 0.5 * np.cos(np.deg2rad(lat)))[None])
    t0 *= np.asarray(m.tmask)
    iso = compute_isopyc(jnp.asarray(t0), m.tmask, m.kmt, m.eos_c,
                         m.eos_to, m.eos_so, bag, cfg.ocean, True,
                         addisop=m.addisop)
    assert float(jnp.abs(iso.vntiso).max()) > 0.0
    assert float(jnp.abs(iso.K33).max()) > 0.0
    assert float(jnp.abs(iso.K11).max()) > 0.0
