"""Integration tests for the assembled ocean step (the reference's
embedded quality controls, SURVEY.md §4: conservation audits, stability
monitors, no-NaN invariants)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.models.ocean.model import SurfaceForcing, make_ocean


@pytest.fixture(scope="module")
def ocean():
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=3600.0, dtuv=900.0, dtsf=900.0, tolrsf=1e8))
    return make_ocean(cfg)


def _init(m, stratified=True):
    g = m.params.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    if stratified:
        t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m.params.topo.tmask)
    return m.init_state(t0)


def _wind(m, amp=1.0):
    g = m.params.grid
    yu = np.asarray(g.yu)
    taux = amp * np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    smf = np.stack([taux / 1.035, np.zeros_like(taux)])
    stf = np.zeros((2, g.jmt, g.imt))
    return SurfaceForcing(smf=jnp.asarray(smf), stf=jnp.asarray(stf))


def test_spinup_stable(ocean):
    m = ocean
    state = _init(m)
    state = m.run(state, _wind(m), 60)
    assert not bool(jnp.isnan(state.t).any())
    assert not bool(jnp.isnan(state.u).any())
    assert not bool(jnp.isnan(state.psi0).any())
    # a wind-driven gyre spins up: psi reaches O(Sv), stays bounded
    psimax = float(jnp.abs(state.psi0).max())
    assert 1e11 < psimax < 1e14
    # velocities bounded (cm/s)
    assert float(jnp.abs(m.full_velocity(state.u, state.psi0)).max()) < 100.0


def test_tracer_conservation(ocean):
    """With zero surface flux, total tracer content is invariant
    (globalsum audit, global_sums.F)."""
    m = ocean
    g = m.params.grid
    state = _init(m)
    dv = (np.asarray(g.dzt)[:, None, None]
          * np.asarray(g.cst)[None, :, None] * np.asarray(g.dyt)[None, :, None]
          * np.asarray(g.dxt)[None, None, :]) * np.asarray(m.params.topo.tmask)
    dv = dv[:, 1:-1, 1:-1]

    def total_heat(s):
        return float((np.asarray(s.t[0])[:, 1:-1, 1:-1] * dv).sum())

    h0 = total_heat(state)
    state = m.run(state, _wind(m), 30)
    h1 = total_heat(state)
    assert abs(h1 - h0) / abs(h0) < 1e-9


def test_leapfrog_forward_mixing_cadence(ocean):
    m = ocean
    state = _init(m)
    state = m.run(state, _wind(m), 3)
    assert int(state.itt) == 3


def test_land_stays_zero(ocean):
    m = ocean
    state = _init(m)
    state = m.run(state, _wind(m), 10)
    land = np.asarray(m.params.topo.tmask) == 0
    assert np.abs(np.asarray(state.t[0])[land]).max() == 0.0
    landu = np.asarray(m.params.topo.umask) == 0
    assert np.abs(np.asarray(state.u[0])[landu]).max() == 0.0
