"""Coupled ocean + atmosphere + sea-ice integration tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.coupler.driver import CoupledModel


@pytest.fixture(scope="module")
def coupled():
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8))
    return CoupledModel(cfg)


def test_coupled_segment_runs(coupled):
    m = coupled
    state = m.init_state()
    state = m.run(state, 4)   # 20 model days
    assert not bool(jnp.isnan(state.ocean.t).any())
    assert not bool(jnp.isnan(state.atm.at).any())
    assert not bool(jnp.isnan(state.ice.hice).any())
    sat = np.asarray(state.atm.at[0])
    assert sat.max() < 60 and sat.min() > -100
    sst = np.asarray(state.ocean.t[0, 0])
    assert sst.max() < 40


def test_ice_forms_and_drifts(coupled):
    m = coupled
    g = m.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    lat = np.broadcast_to(g.yt[:, None], (g.jmt, g.imt))
    sst = np.maximum(29.0 * np.cos(np.deg2rad(lat)) ** 2 - 1.93, -1.93)
    t0[0] = np.where(np.abs(lat)[None] > 60, -1.93,
                     sst[None] * np.exp(-np.asarray(g.zt) / 800e2)
                     [:, None, None])
    t0 *= np.asarray(m.topo.tmask)
    state = m.init_state(t0)
    state = m.run(state, 6)   # 30 model days
    hice = np.asarray(state.ice.hice)
    aice = np.asarray(state.ice.aice)
    assert hice.max() > 10.0          # ice grew (cm)
    assert 0 < aice.max() <= 1.0
    assert np.abs(np.asarray(state.ice.uice)).max() > 0.1   # EVP drift
    assert np.abs(np.asarray(state.ice.uice)).max() < 100.0
    # snow accumulated on the ice somewhere cold
    assert np.asarray(state.ice.hsno).max() >= 0.0
    # land never holds sea ice thickness
    land = np.asarray(m.embm.tmsk) == 0
    assert hice[land].max() == 0.0


def test_awind_feedback():
    cfg = small_config()
    cfg = cfg.replace(
        ocean=dataclasses.replace(
            cfg.ocean, isopycmix=False, gent_mcwilliams=False,
            dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8),
        embm=dataclasses.replace(cfg.embm, awind=True))
    m = CoupledModel(cfg)
    state = m.init_state()
    # climatology 2 K colder than the state: a warm anomaly everywhere
    m.awind.set_climatology(np.asarray(state.atm.at[0]) - 2.0)
    w2, tx2, ty2, ws2 = m.awind.apply(
        state.atm.at[0], m.embm.winds, m.taux_w, m.tauy_w, m.embm.wspd)
    assert not bool(jnp.isnan(tx2).any())
    assert float(jnp.abs(tx2 - m.taux_w).max()) > 0.0
    assert float(ws2.min()) > 0.0
    state = m.run(state, 2)
    assert not bool(jnp.isnan(state.atm.at).any())
    assert not bool(jnp.isnan(state.ocean.t).any())


def test_seasonal_insolation():
    from uvic_tpu.models.embm.insolation import daily_insolation
    import jax.numpy as j
    lat = j.deg2rad(j.asarray([[70.0], [-70.0]]))
    summer = daily_insolation(lat, 172.0)   # NH solstice
    winter = daily_insolation(lat, 355.0)
    assert float(summer[0, 0]) > float(winter[0, 0]) + 1e4
    assert float(summer[1, 0]) < float(winter[1, 0])

    cfg = small_config()
    cfg = cfg.replace(
        ocean=dataclasses.replace(
            cfg.ocean, isopycmix=False, gent_mcwilliams=False,
            dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8),
        embm=dataclasses.replace(cfg.embm, seasonal=True))
    m = CoupledModel(cfg)
    state = m.init_state()
    state = m.run(state, 2)
    assert not bool(jnp.isnan(state.atm.at).any())
