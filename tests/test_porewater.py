"""Tests for the Archer pore-water sediment diagenesis columns."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.models.sed.porewater import (ZSED, calc_buff, calc_k,
                                           init_porewater,
                                           porewater_step, _tridiag)


def _bw(jmt=2, imt=2, **over):
    d = dict(temp=jnp.full((jmt, imt), 2.0),
             sal=jnp.full((jmt, imt), 35.0),
             alk_bw=jnp.full((jmt, imt), 2.4e-3),
             tco2_bw=jnp.full((jmt, imt), 2.35e-3),
             o2_bw=jnp.full((jmt, imt), 1.5e-4),
             rain_cal=jnp.full((jmt, imt), 1e-6 / 3.15e7),
             rain_org=jnp.full((jmt, imt), 1e-6 / 3.15e7),
             depth_m=jnp.full((jmt, imt), 4000.0),
             ocean_mask=jnp.ones((jmt, imt)),
             dtsed_s=86400.0 * 360)
    d.update(over)
    return d


def test_tridiag_matches_dense():
    rng = np.random.RandomState(1)
    n = 6
    A = np.diag(rng.rand(n) + 2.0) + np.diag(rng.rand(n - 1) * 0.5, -1) \
        + np.diag(rng.rand(n - 1) * 0.5, 1)
    r = rng.rand(n)
    a = np.concatenate([[0.0], np.diag(A, -1)])
    b = np.diag(A)
    c = np.concatenate([np.diag(A, 1), [0.0]])
    x = np.asarray(_tridiag(jnp.asarray(a)[:, None],
                            jnp.asarray(b)[:, None],
                            jnp.asarray(c)[:, None],
                            jnp.asarray(r)[:, None]))[:, 0]
    np.testing.assert_allclose(x, np.linalg.solve(A, r), rtol=1e-12)


def test_calc_k_saturation_deepens():
    """Sayles csat increases with pressure -> a lysocline exists."""
    t = jnp.full((3,), 2.0)
    s = jnp.full((3,), 35.0)
    z = jnp.asarray([1000.0, 3000.0, 5000.0])
    _, _, _, csat = calc_k(t, s, z)
    c = np.asarray(csat)
    assert np.all(np.diff(c) > 0)
    assert 4e-5 < c[0] < 9e-5       # ~60 umol/l at 1 km


def test_calc_buff_consistency():
    """CO2 + HCO3 + CO3 = TCO2 and carbonate alkalinity < ALK."""
    t = jnp.full((4,), 2.0)
    k1, k2, kb, _ = calc_k(t, jnp.full((4,), 35.0),
                           jnp.full((4,), 3000.0))
    alk = jnp.full((4,), 2.4e-3)
    tco2 = jnp.full((4,), 2.30e-3)
    co2, hco3, co3 = calc_buff(alk, tco2, jnp.full((4,), 35.0),
                               k1, k2, kb)
    total = np.asarray(co2 + hco3 + co3)
    np.testing.assert_allclose(total, 2.30e-3, rtol=1e-3)
    ca = np.asarray(hco3 + 2 * co3)
    assert np.all(ca < 2.4e-3) and np.all(ca > 2.0e-3)


def test_porewater_profile_relaxes_to_saturation():
    """Classic Archer profile: pore-water CO3 rises from the
    undersaturated bottom water toward csat at depth in the column."""
    st = init_porewater(2, 2)
    new, fl = porewater_step(st, **_bw())
    co3 = np.asarray(new.carb[2, :, 0, 0])
    csat = float(fl["csat"][0, 0])
    bw = float(fl["co3_bw"][0, 0])
    assert co3[0] == pytest.approx(bw, rel=1e-6)
    assert np.all(np.diff(co3) > 0)           # monotone toward csat
    assert co3[-1] < csat                     # bounded by saturation
    assert co3[-1] > 0.9 * csat


def test_lysocline_response():
    """Dissolution switches on across the saturation horizon: the
    calcite return flux at 5 km vastly exceeds that at 1.5 km."""
    st = init_porewater(2, 2)
    _, shallow = porewater_step(
        st, **_bw(depth_m=jnp.full((2, 2), 1500.0)))
    _, deep = porewater_step(
        st, **_bw(depth_m=jnp.full((2, 2), 5000.0)))
    assert float(deep["ttrcal"].mean()) > \
        5.0 * float(shallow["ttrcal"].mean())


def test_oxygen_penetration_shoals_with_rain():
    """More organic rain -> shallower O2 penetration depth (o2org
    zrct update)."""
    st = init_porewater(2, 2)
    _, lo = porewater_step(st, **_bw(
        rain_org=jnp.full((2, 2), 0.2e-6 / 3.15e7)))
    _, hi = porewater_step(st, **_bw(
        rain_org=jnp.full((2, 2), 30e-6 / 3.15e7)))
    assert float(hi["zrct"].mean()) < float(lo["zrct"].mean())
    assert float(lo["zrct"].mean()) <= ZSED[-1] + 1e-9


def test_calcite_stock_erodes_under_corrosive_water():
    """Repeated steps in undersaturated water dissolve the mixed-layer
    calcite standing stock (n_control=2 time stepping)."""
    st = init_porewater(1, 1)
    kw = _bw(1, 1, depth_m=jnp.full((1, 1), 5000.0))
    frac0 = float(st.calgg[-1, 0, 0])
    for _ in range(5):
        st, _ = porewater_step(st, **kw)
    assert float(st.calgg[-1, 0, 0]) < frac0
    assert float(st.calgg.min()) >= 0.0


def test_coupled_driver_porewater_runs():
    """A coupled segment with the pore-water sediment path wired."""
    from uvic_tpu.config import BgcConfig, SedConfig, small_config
    from uvic_tpu.coupler.driver import CoupledModel
    cfg = small_config()
    cfg = cfg.replace(
        ocean=dataclasses.replace(cfg.ocean, isopycmix=False,
                                  gent_mcwilliams=False, dtts=43200.0,
                                  dtuv=1800.0, dtsf=1800.0,
                                  tolrsf=1e8),
        bgc=BgcConfig(suite="mobi", carbon=True, alk=True, o2=True,
                      nitrogen=True, caco3=True),
        sed=SedConfig(enabled=True, porewater=True))
    m = CoupledModel(cfg)
    state = m.init_state()
    state = m.run(state, 2)
    assert not bool(jnp.isnan(state.ocean.t).any())
    assert not bool(jnp.isnan(state.sed.carb).any())
    assert not bool(jnp.isnan(state.sed.calgg).any())
