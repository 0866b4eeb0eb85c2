"""Fused Pallas tracer kernel == XLA tracer_step (interpreter mode).

The kernel must reproduce tracer_step(scheme='fct') elementwise: same
FCT limiter, same harmonic diffusion (both meridional forms), same
implicit vertical solve, same boundary handling.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.models.ocean.kernels import tracer_step
from uvic_tpu.models.ocean.model import make_forcing, make_ocean
from uvic_tpu.ops.pallas_tracer import make_fct_tracer_step
from uvic_tpu.ops.stencil import E, N, S, W, UP


def _setup(isopyc=False):
    cfg = small_config(imt=40, jmt=34, km=8)
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=isopyc, gent_mcwilliams=isopyc,
        dtts=43200.0, dtuv=1800.0, dtsf=1800.0))
    m = make_ocean(cfg)
    g = m.params.grid
    rng = np.random.default_rng(7)
    nt = m.nt
    t0 = np.zeros((nt, g.km, g.jmt, g.imt))
    t0[0] = 15.0 + 4.0 * rng.standard_normal((g.km, g.jmt, g.imt))
    t0[1] = 0.035 + 1e-4 * rng.standard_normal((g.km, g.jmt, g.imt))
    t0 *= np.asarray(m.params.topo.tmask)
    tm1 = t0 + 0.05 * rng.standard_normal(t0.shape) \
        * np.asarray(m.params.topo.tmask)
    u = 2.0 * rng.standard_normal((g.km, g.jmt, g.imt)) \
        * np.asarray(m.params.topo.umask)
    v = 2.0 * rng.standard_normal((g.km, g.jmt, g.imt)) \
        * np.asarray(m.params.topo.umask)
    from uvic_tpu.models.ocean.kernels import adv_vel
    from uvic_tpu.ops.stencil import setbcx
    uj = setbcx(jnp.asarray(u), True)
    vj = setbcx(jnp.asarray(v), True)
    vet, vnt, vbt, *_ = adv_vel(uj, vj, m.g, True)
    stf = 1e-5 * rng.standard_normal((nt, g.jmt, g.imt))
    btf = 1e-6 * rng.standard_normal((nt, g.jmt, g.imt))
    src = 1e-7 * rng.standard_normal(t0.shape)
    return m, (jnp.asarray(t0), jnp.asarray(tm1), vet, vnt, vbt,
               jnp.asarray(stf), jnp.asarray(btf), jnp.asarray(src))


@pytest.mark.parametrize("aidif,with_src", [(0.0, False), (1.0, True)])
def test_pallas_tracer_matches_xla(aidif, with_src):
    m, (t0, tm1, vet, vnt, vbt, stf, btf, src) = _setup()
    g = m.g
    cfg = m.cfg.ocean
    c2dtts = 2 * cfg.dtts
    source = src if with_src else None

    ref = tracer_step(t0, tm1, vet, vnt, vbt, stf, btf, source,
                      m.diff_cbt, m.kmt, m.tmask, g, c2dtts, "fct",
                      aidif, True, iso=None, hmix=None)

    fn = make_fct_tracer_step(
        m.nt, t0.shape[1], t0.shape[2], t0.shape[3], g,
        cfg.ah, aidif, ydiff_fluxform=False, has_src=with_src,
        dtype=t0.dtype, interpret=True)
    got = fn(t0, tm1, vet, vnt, vbt, m.diff_cbt, stf, btf, source,
             c2dtts * g.dtxcel, m.tmask, m.kmt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_pallas_tracer_iso_fluxform():
    """Isopycnal configuration: kernel's flux-form meridional diffusion
    + the Redi tendencies folded through the source input reproduce the
    full tracer_step iso path."""
    m, (t0, tm1, vet, vnt, vbt, stf, btf, src) = _setup(isopyc=True)
    g = m.g
    cfg = m.cfg.ocean
    c2dtts = 2 * cfg.dtts

    from uvic_tpu.models.ocean.isopyc import compute_isopyc, isoflux
    iso = compute_isopyc(tm1, m.tmask, m.kmt, m.eos_c, m.eos_to,
                         m.eos_so, g, cfg, True, addisop=m.addisop)
    diff_cbt = m.diff_cbt + iso.K33
    vet_t = vet + iso.vetiso
    vnt_t = vnt + iso.vntiso
    vbt_t = vbt + iso.vbtiso

    ref = tracer_step(t0, tm1, vet_t, vnt_t, vbt_t, stf, btf, src,
                      diff_cbt, m.kmt, m.tmask, g, c2dtts, "fct",
                      cfg.aidif, True, iso=iso, hmix=None)

    # linear split: Redi flux divergence as an extra tendency
    fe_iso, fn_iso, fb_iso = isoflux(iso, tm1, m.tmask, g, True)
    tmask = m.tmask
    dztr = g.dztr[:, None, None]
    iso_tend = ((fe_iso * E(tmask)[None] - W(fe_iso) * W(tmask)[None])
                * g.cstdxtr[None, None]
                + (fn_iso * N(tmask)[None] - S(fn_iso) * S(tmask)[None])
                * (1.0 / (g.cst * g.dyt))[None, None, :, None]
                + (UP(fb_iso) - fb_iso) * dztr[None])

    fn = make_fct_tracer_step(
        m.nt, t0.shape[1], t0.shape[2], t0.shape[3], g,
        cfg.ah, cfg.aidif, ydiff_fluxform=True, has_src=True,
        dtype=t0.dtype, interpret=True)
    got = fn(t0, tm1, vet_t, vnt_t, vbt_t, diff_cbt, stf, btf,
             src + iso_tend, c2dtts * g.dtxcel, m.tmask, m.kmt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-11, atol=1e-11)


def test_pallas_tracer_iso_weights_in_kernel():
    """Round-5 perf path: the 18-slot weight pack applied INSIDE the
    kernel (has_iso=True) reproduces the full tracer_step iso path —
    same reference as the source-fed split, no XLA iso tendency."""
    m, (t0, tm1, vet, vnt, vbt, stf, btf, src) = _setup(isopyc=True)
    g = m.g
    cfg = m.cfg.ocean
    c2dtts = 2 * cfg.dtts

    from uvic_tpu.models.ocean.isopyc import (compute_isopyc,
                                              iso_weight_pack,
                                              iso_weight_stack)
    iso = compute_isopyc(tm1, m.tmask, m.kmt, m.eos_c, m.eos_to,
                         m.eos_so, g, cfg, True, addisop=m.addisop)
    diff_cbt = m.diff_cbt + iso.K33
    vet_t = vet + iso.vetiso
    vnt_t = vnt + iso.vntiso
    vbt_t = vbt + iso.vbtiso

    ref = tracer_step(t0, tm1, vet_t, vnt_t, vbt_t, stf, btf, src,
                      diff_cbt, m.kmt, m.tmask, g, c2dtts, "fct",
                      cfg.aidif, True, iso=iso, hmix=None)

    isow = iso_weight_stack(iso_weight_pack(iso, g))
    fn = make_fct_tracer_step(
        m.nt, t0.shape[1], t0.shape[2], t0.shape[3], g,
        cfg.ah, cfg.aidif, ydiff_fluxform=True, has_src=True,
        dtype=t0.dtype, interpret=True, has_iso=True)
    got = fn(t0, tm1, vet_t, vnt_t, vbt_t, diff_cbt, stf, btf, src,
             c2dtts * g.dtxcel, m.tmask, m.kmt, isow=isow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-9, atol=1e-11)
