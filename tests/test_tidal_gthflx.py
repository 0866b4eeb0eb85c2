"""Tests: tidal mixing (O_tidal_kv) and geothermal heating (O_gthflx)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from uvic_tpu.config import small_config
from uvic_tpu.models.ocean.model import make_forcing, make_ocean


def _strat_ic(m):
    g = m.params.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m.params.topo.tmask)
    return t0


def test_geoheatflux_field_global_mean():
    """Hamza et al. 2007 degree-12 field: global conductive heat flow
    ~87 mW/m^2, everywhere positive over the sampled globe."""
    from uvic_tpu.models.ocean.gthflx import geoheatflux_field
    f = geoheatflux_field(np.linspace(0.0, 358.0, 180),
                          np.linspace(-89.0, 89.0, 90))
    mw = f * 41840000.0
    lat_w = np.cos(np.deg2rad(np.linspace(-89, 89, 90)))[:, None]
    mean = (mw * lat_w).sum() / (lat_w.sum() * mw.shape[1])
    assert 60.0 < mean < 110.0
    assert mw.min() > 0.0 and mw.max() < 600.0


def test_gthflx_warms_bottom():
    cfg = small_config()
    base = dataclasses.replace(cfg.ocean, isopycmix=False,
                               gent_mcwilliams=False, dtts=43200.0,
                               dtuv=1800.0, dtsf=1800.0, tolrsf=1e8)
    m_on = make_ocean(cfg.replace(ocean=dataclasses.replace(
        base, gthflx=True)))
    m_off = make_ocean(cfg.replace(ocean=base))
    t0 = _strat_ic(m_on)
    g = m_on.params.grid
    f = make_forcing(jnp.zeros((2, g.jmt, g.imt)),
                     jnp.zeros((m_on.nt, g.jmt, g.imt)))
    s_on = m_on.step(m_on.init_state(t0), f, leapfrog=False)
    s_off = m_off.step(m_off.init_state(t0), f, leapfrog=False)
    dT = np.asarray(s_on.t[0] - s_off.t[0])
    kmt = np.asarray(m_on.kmt)
    wet = np.asarray(m_on.params.topo.tmask) > 0
    # bottom cells warm
    kb = np.maximum(kmt - 1, 0)
    jj, ii = np.nonzero(kmt > 0)
    bot = dT[kb[jj, ii], jj, ii]
    assert bot.mean() > 0.0
    # magnitude: ~84 mW/m^2 over 200 m for 12 h ~ 4e-6 K
    assert 1e-8 < bot.mean() < 1e-3
    # surface untouched by the bottom flux in one explicit step
    assert np.abs(dT[0][wet[0] & (kmt > 1)]).max() < 1e-12


def test_tidal_kv_enhances_deep_mixing():
    """O_tidal_kv raises diff_cbt above background near the bottom and
    leaves it at background where stratification is strong/shallow."""
    from uvic_tpu.models.ocean.vmix import (default_tidal_edr,
                                            tidal_kv_diff)
    cfg = small_config()
    m = make_ocean(cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=True, gent_mcwilliams=False,
        tidal_kv=True, dtts=43200.0, dtuv=1800.0, dtsf=1800.0,
        tolrsf=1e8)))
    g = m.params.grid
    km = g.km
    kmt = m.kmt
    # synthetic stratification: N^2 ~ 1e-6 s^-2 -> drodzb < 0
    drodzb = jnp.full((km, g.jmt, g.imt), -1e-6 * 1.035 / 980.6)
    edr = default_tidal_edr(np.asarray(kmt), np.asarray(g.dzt))
    base = 0.35
    diff = tidal_kv_diff(drodzb, kmt, jnp.asarray(np.asarray(g.zw)),
                         m.tlat_deg, edr, base)
    d = np.asarray(diff)
    kmtn = np.asarray(kmt)
    jj, ii = np.nonzero(kmtn >= 4)
    near_bot = d[np.maximum(kmtn - 2, 0)[jj, ii], jj, ii]
    assert (near_bot > base + 1e-3).mean() > 0.9   # enhanced
    assert d.min() >= base - 1e-12                 # never below base
    assert d.max() <= 100.0 + 1e-9                 # capped
    # decays away from the bottom: surface face stays ~background
    surf = d[0][kmtn > 4]
    assert np.median(surf - base) < np.median(near_bot - base)


def test_tidal_kv_step_runs():
    """Full step with isopyc + tidal_kv wired stays finite."""
    cfg = small_config()
    m = make_ocean(cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=True, gent_mcwilliams=True,
        tidal_kv=True, dtts=3600.0, dtuv=900.0, dtsf=900.0,
        tolrsf=1e8)))
    t0 = _strat_ic(m)
    g = m.params.grid
    f = make_forcing(jnp.zeros((2, g.jmt, g.imt)),
                     jnp.zeros((m.nt, g.jmt, g.imt)))
    s = m.step(m.init_state(t0), f, leapfrog=False)
    for _ in range(3):
        s = m.step(s, f, leapfrog=True)
    assert not bool(jnp.isnan(s.t).any())
