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


def test_transient_volcanic_cools():
    """A volcanic solar reduction lowers SAT vs an unforced twin
    (solardata/volcdata application through fluxes.F solins)."""
    def make():
        cfg = small_config()
        cfg = cfg.replace(ocean=dataclasses.replace(
            cfg.ocean, isopycmix=False, gent_mcwilliams=False,
            dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8))
        return CoupledModel(cfg)

    m0, m1 = make(), make()
    s0, s1 = m0.init_state(), m1.init_state()
    s0 = m0.run(s0, 3)
    # big volcanic spike: 5% solar reduction for the whole window
    from uvic_tpu.io.forcing import TransientForcing, TransientSeries
    m1.set_transient_forcing(TransientForcing(
        co2=TransientSeries.constant(280.0),
        solar=TransientSeries.constant(1.368e6),
        volcanic=TransientSeries.constant(0.05 * 1.368e6),
        c14=TransientSeries.constant(0.0)))
    s1 = m1.run(s1, 3)
    assert m1.solar_scale < 1.0
    sat0 = float(jnp.mean(s0.atm.at[0]))
    sat1 = float(jnp.mean(s1.atm.at[0]))
    assert sat1 < sat0 - 0.05, (sat0, sat1)


def test_transient_sulphate_and_c14():
    """Sulphate albedo reduction cools; dc14ccn reaches the c14 air-sea
    flux (gasbc.F:652-654 via surface_gas_fluxes)."""
    import uvic_tpu.models.bgc.gasx as gasx
    from uvic_tpu.coupler.tracers import TracerIndex, build_registry
    from uvic_tpu.config import BgcConfig

    # unit-level: c14 flux responds to dc14ccn
    jmt = imt = 4
    sst = jnp.full((jmt, imt), 20.0)
    sss = jnp.full((jmt, imt), 35.0)
    wspd = jnp.full((jmt, imt), 700.0)
    ao = jnp.ones((jmt, imt))
    idx = TracerIndex(build_registry(BgcConfig(
        suite="mobi", carbon=True, alk=True, o2=True, carbon_14=True)))
    nt = len(idx.tracers)
    surf = jnp.zeros((nt, jmt, imt))
    surf = surf.at[idx.idic].set(2.3).at[idx.ialk].set(2.4)
    surf = surf.at[idx["c14"]].set(2.2).at[idx.io2].set(0.2)
    f0, _ = gasx.surface_gas_fluxes(sst, sss, wspd, ao, surf, idx,
                                    dc14ccn=0.0)
    f1, _ = gasx.surface_gas_fluxes(sst, sss, wspd, ao, surf, idx,
                                    dc14ccn=500.0)
    assert float(f1[idx["c14"]].mean()) > float(f0[idx["c14"]].mean())

    # sulphate field reduces downward shortwave in the EMBM
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8))
    m = CoupledModel(cfg)
    state = m.init_state()
    fl0 = m.embm.fluxes(state.atm, state.ocean.t[0, 0])
    fl1 = m.embm.fluxes(state.atm, state.ocean.t[0, 0],
                        sulph=0.05 * m._sulph_pattern)
    d = np.asarray(fl0["dnswr"] - fl1["dnswr"])
    assert d.max() > 0.0 and d.min() >= 0.0


def test_land_gc_feedback():
    """MTLM canopy conductance changes the EMBM land evaporation
    (glsbc.F / fluxes.F O_mtlm land branch)."""
    cfg = small_config()
    cfg = cfg.replace(
        ocean=dataclasses.replace(
            cfg.ocean, isopycmix=False, gent_mcwilliams=False,
            dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8),
        land=dataclasses.replace(cfg.land, enabled=True))
    m = CoupledModel(cfg)
    state = m.init_state()
    # wet soil so the land branch evaporates
    state = state.replace(atm=state.atm.replace(
        soilm=jnp.full_like(state.atm.soilm, 10.0)))
    lmsk = np.asarray(m.embm.lmsk) > 0

    fl_closed = m.embm.fluxes(state.atm, state.ocean.t[0, 0],
                              land_gc=jnp.full_like(state.atm.soilm,
                                                    1e-12))
    fl_open = m.embm.fluxes(state.atm, state.ocean.t[0, 0],
                            land_gc=jnp.full_like(state.atm.soilm, 1.0))
    ev_c = np.asarray(fl_closed["evap"])[lmsk]
    ev_o = np.asarray(fl_open["evap"])[lmsk]
    assert ev_o.mean() >= ev_c.mean()
    assert (np.asarray(fl_open["evap"]) >= 0).all()

    # end-to-end: a segment with land enabled produces a gc field and
    # the nep diagnostic
    state = m.run(state, 2)
    assert state.land is not None
    assert float(jnp.abs(state.land.gc).max()) > 0.0
    assert m.last_nep_kgC_s is not None
    assert not bool(jnp.isnan(state.atm.at).any())


def test_convect_brine_coupled():
    """O_convect_brine: ice-growth brine drives per-category convection
    (convect_brine.F); the run is stable and total ocean salt matches
    the no-brine twin closely (same salt enters, different pathway)."""
    def make(brine):
        cfg = small_config()
        cfg = cfg.replace(ocean=dataclasses.replace(
            cfg.ocean, isopycmix=False, gent_mcwilliams=False,
            dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8,
            convect_brine=brine))
        return CoupledModel(cfg)

    import numpy as np
    m0, m1 = make(False), make(True)
    # cold high latitudes so ice forms and rejects brine
    g = m0.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    lat = np.broadcast_to(g.yt[:, None], (g.jmt, g.imt))
    sst = np.maximum(29.0 * np.cos(np.deg2rad(lat)) ** 2 - 1.93, -1.93)
    t0[0] = np.where(np.abs(lat)[None] > 60, -1.93,
                     sst[None] * np.exp(-np.asarray(g.zt) / 800e2)
                     [:, None, None])
    t0 *= np.asarray(m0.topo.tmask)
    s0 = m0.run(m0.init_state(t0.copy()), 4)
    s1 = m1.run(m1.init_state(t0.copy()), 4)
    assert not bool(jnp.isnan(s1.ocean.t).any())
    assert float(jnp.abs(s1.ice.hice).max()) > 1.0   # ice formed
    # same total salt delivered (different vertical pathway)
    from uvic_tpu.diag.conservation import FullAudit
    a0, a1 = FullAudit(m0), FullAudit(m1)
    salt0 = a0.inventories(s0)["ocn_salt_kg"]
    salt1 = a1.inventories(s1)["ocn_salt_kg"]
    scale = abs(salt0) + abs(salt1) + 1e3
    assert abs(salt0 - salt1) / scale < 0.1, (salt0, salt1)
    # the pathways genuinely differ somewhere in the column
    assert float(jnp.abs(s0.ocean.t[1] - s1.ocean.t[1]).max()) > 0.0


def test_debug_nan_bisector():
    """SURVEY 5.2 step-level sanitizer: nan_report names poisoned
    leaves with locations; bisect_segment replays a segment phase by
    phase and attributes the first non-finite value (clean state ->
    ok=True; poisoned ice thickness -> caught in the atm/ice phase)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from uvic_tpu.config import small_config
    from uvic_tpu.coupler.driver import CoupledModel
    from uvic_tpu.debug import bisect_segment, nan_report

    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8))
    m = CoupledModel(cfg)
    state = m.init_state()
    state = m.run_segment(state)
    assert nan_report(state) == []
    res = bisect_segment(m, state, max_substeps=2)
    assert res["ok"], res

    bad = state.replace(ice=state.ice.replace(
        hice=state.ice.hice.at[5, 5].set(jnp.nan)))
    rep = nan_report(bad)
    assert any("hice" in k for k, n, loc in rep)
    res = bisect_segment(m, bad, max_substeps=2)
    assert not res["ok"]
    assert "atm_ice" in res["phase"] or "ocean" in res["phase"]
