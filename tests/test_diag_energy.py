"""Circulation diagnostics: MOC closure, gyre decomposition, energetics."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from uvic_tpu.config import small_config
from uvic_tpu.diag.energy import (energy_integrals, gyre_components,
                                  meridional_overturning,
                                  overturning_extrema,
                                  tracer_term_balance)
from uvic_tpu.models.ocean.model import make_forcing, make_ocean


def _spin(nsteps=20):
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=3600.0, dtuv=900.0, dtsf=900.0, tolrsf=1e8))
    m = make_ocean(cfg)
    g = m.params.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m.params.topo.tmask)
    yu = np.asarray(g.yu)
    taux = np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    f = make_forcing(jnp.asarray(np.stack([taux / 1.035,
                                           np.zeros_like(taux)])),
                     jnp.zeros((m.nt, g.jmt, g.imt)))
    s0 = m.init_state(t0)
    t_start = jnp.array(s0.t)           # snapshot: run() donates s0
    return m, t_start, m.run(s0, f, nsteps), f


def _full_v(m, s):
    from uvic_tpu.models.ocean.tropic import ext_mode_velocity
    uext, vext = ext_mode_velocity(s.psi0, m.g.hr, m.g.dxu2r,
                                   m.g.dyu2r, m.g.csur)
    return s.u[1] + vext[None]


def test_moc_closes():
    m, t_start, s, f = _spin()
    v = _full_v(m, s)
    psi = meridional_overturning(v, m.g, m.umask)
    assert psi.shape == (m.params.grid.km, m.params.grid.jmt)
    assert not bool(jnp.isnan(psi).any())
    # rigid lid: total volume transport through any latitude circle
    # vanishes, so the bottom-most streamfunction value returns to ~0
    top = float(jnp.abs(psi).max())
    bottom = float(jnp.abs(psi[-1]).max())
    assert top > 0.0
    assert bottom < 1e-4 * max(top, 1.0)
    ext = overturning_extrema(psi, m.params.grid)
    assert float(ext["moc_max_sv"]) >= float(ext["moc_deep_max_sv"])


def test_gyre_decomposition_sums():
    m, t_start, s, f = _spin()
    v = _full_v(m, s)
    comp = gyre_components(v, s.t[0], m.g, m.tmask,
                           smf=f.smf, cori=m.g.cori[0])
    tot = comp["total_adv"]
    np.testing.assert_allclose(np.asarray(comp["overturning"]
                                          + comp["gyre"]),
                               np.asarray(tot), rtol=0, atol=1e-6
                               * float(jnp.abs(tot).max() + 1))
    np.testing.assert_allclose(np.asarray(comp["depth_mean"]
                                          + comp["ekman"]
                                          + comp["residual"]),
                               np.asarray(tot), rtol=0, atol=1e-6
                               * float(jnp.abs(tot).max() + 1))


def test_energy_integrals():
    m, t_start, s, f = _spin()
    e = energy_integrals(s, m, forcing=f)
    assert float(e["ke_total_per_vol"]) > 0.0
    assert float(e["ke_external_per_vol"]) >= 0.0
    assert float(e["ke_internal_per_vol"]) >= 0.0
    # the wind does net positive work on a wind-driven spinup
    assert float(e["wind_work_per_area"]) > 0.0
    assert float(e["psi_max_sv"]) > 0.0


def test_term_balance_masks():
    m, t_start, s, f = _spin()
    g2 = m.params.grid
    north = np.zeros((g2.jmt, g2.imt))
    north[g2.jmt // 2:] = 1.0
    regions = jnp.asarray(np.stack([north, 1.0 - north]))
    bal = tracer_term_balance(s.t, t_start, 2 * 3600.0 * 20,
                              regions, m.g, m.tmask)
    assert bal.shape == (2, m.nt)
    assert not bool(jnp.isnan(bal).any())
