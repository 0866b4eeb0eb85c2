"""Multi-category (CPTS) sea-ice tests: enthalpy inversion, growth/melt,
category re-binning, ridging conservation (reference source/ice/cpts.F)."""

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.models.ice import cpts


def test_enthalpy_temperature_roundtrip():
    S = cpts.salinity_profile(4)
    T = np.linspace(-25.0, -0.5, 40)[:, None] * np.ones((1, 4))
    q = cpts.energy_of_melt(jnp.asarray(T), jnp.asarray(S))
    T2 = cpts.temp_from_energy(q, jnp.asarray(S))
    np.testing.assert_allclose(np.asarray(T2), T, rtol=1e-10)
    # energy of melt is negative and below -latent-heat at cold temps
    assert float(q.max()) < 0.0


def _mk_state(ncat=3, nlay=4, jmt=6, imt=6, hi=20.0, a=0.5):
    st = cpts.init_cpts_state(ncat, nlay, jmt, imt, jnp.float64)
    A = np.zeros((ncat, jmt, imt))
    heff = np.zeros_like(A)
    A[0] = a
    heff[0] = a * hi
    S = cpts.salinity_profile(nlay)
    q = np.asarray(cpts.energy_of_melt(jnp.full((nlay,), -5.0),
                                       jnp.asarray(S)))
    E = np.zeros((ncat, nlay, jmt, imt))
    E[0] = (q * hi * a / nlay)[:, None, None]
    return st.replace(A=jnp.asarray(A), heff=jnp.asarray(heff),
                      E=jnp.asarray(E),
                      Ts=jnp.full((ncat, jmt, imt), -10.0) * (A > 0)), S


def _thermo(st, tair, sst, dts=43200.0, nlay=4):
    S = cpts.salinity_profile(nlay)
    jmt, imt = st.A.shape[1:]
    one = jnp.ones((jmt, imt))
    frzpt = -1.8 * one
    return cpts.cpts_thermo(
        st, tair * one, 2e-3 * one, sst * one, frzpt,
        solins=300e3 * one, aca=0.8 * one, wspd=500.0 * one, tmsk=one,
        dts=dts, saltz=jnp.asarray(S), hstar=cpts.HSTAR[3],
        dnswr_ow=100e3 * one, uplwr_ow=120e3 * one, upsens_ow=20e3 * one,
        upltnt_ow=30e3 * one, evap_ow=1e-5 * one)


def test_cold_growth_and_warm_melt():
    st, S = _mk_state()
    new, fl, adj, aice = _thermo(st, tair=-25.0, sst=-1.8)
    assert np.isfinite(np.asarray(new.heff)).all()
    assert float(new.heff.sum()) > float(st.heff.sum())  # grows when cold
    assert float(new.E.max()) <= 0.0
    assert float(aice.max()) <= 1.0

    warm, fl2, adj2, _ = _thermo(st, tair=10.0, sst=2.0)
    assert float(warm.heff[0].sum()) < float(st.heff[0].sum())
    # melting returns latent heat demand to the ocean adjustment
    assert float(adj2["heat"].sum()) < 0.0


def test_new_ice_forms_over_open_water_when_freezing():
    st = cpts.init_cpts_state(3, 4, 6, 6, jnp.float64)
    S = cpts.salinity_profile(4)
    new, _, _, aice = _thermo(st, tair=-30.0, sst=-1.8)
    assert float(new.A[0].max()) > 0.0
    assert float(new.heff[0].max()) > 0.0
    assert float(new.E.max()) <= 0.0


def test_rebin_moves_thick_ice_and_conserves():
    st, S = _mk_state(hi=120.0)  # 120 cm sits in bin 2 of {10,50,250} bounds
    out = cpts.rebin(st, cpts.HSTAR[3])
    np.testing.assert_allclose(float(out.A.sum()), float(st.A.sum()),
                               rtol=1e-12)
    np.testing.assert_allclose(float(out.heff.sum()), float(st.heff.sum()),
                               rtol=1e-12)
    np.testing.assert_allclose(float(out.E.sum()), float(st.E.sum()),
                               rtol=1e-12)
    assert float(out.A[0].max()) == 0.0
    assert float(out.A[1].max()) > 0.0   # bins are {<50, 50-250, >250}


def test_ridge_conserves_volume_and_closes_area():
    st, S = _mk_state(hi=30.0, a=0.9)
    jmt, imt = st.A.shape[1:]
    divu = -1e-6 * jnp.ones((jmt, imt))   # strong convergence
    out = cpts.ridge(st, divu, dts=43200.0, hstar=cpts.HSTAR[3])
    np.testing.assert_allclose(float(out.heff.sum()), float(st.heff.sum()),
                               rtol=1e-9)
    np.testing.assert_allclose(float(out.E.sum()), float(st.E.sum()),
                               rtol=1e-9)
    assert float(out.A.sum()) < float(st.A.sum())    # ridging closes area
    # ridged ice landed in a thicker category
    assert float(out.heff[1:].sum()) > float(st.heff[1:].sum())


def test_remap_layers_conserves_energy():
    rng = np.random.default_rng(0)
    nlay = 4
    q = -jnp.asarray(rng.uniform(2e9, 4e9, (5, nlay)))
    hi = jnp.asarray(rng.uniform(50.0, 150.0, (5,)))
    dht = -jnp.asarray(rng.uniform(0.0, 5.0, (5,)))
    dhb = jnp.asarray(rng.uniform(-5.0, 5.0, (5,)))
    qn = jnp.full((5,), -2.5e9)
    q2, hi2 = cpts._remap_layers(q, hi, dht, dhb, qn, nlay)
    e_old = (q * (hi / nlay)[:, None]).sum(1)
    # expected: old column minus melted slabs plus grown slab
    e_expect = e_old - q[:, 0] * (-dht) \
        - jnp.where(dhb < 0, q[:, -1] * (-dhb), 0.0) \
        + jnp.where(dhb > 0, qn * dhb, 0.0)
    e_new = (q2 * (hi2 / nlay)[:, None]).sum(1)
    np.testing.assert_allclose(np.asarray(e_new), np.asarray(e_expect),
                               rtol=1e-10)


def test_bottom_congelation_without_open_water():
    """Cold ice over full cover must grow from below (condb > fbot).

    Regression for the condb sign inversion: with a=1 there is no
    open-water frazil to mask the loss of congelation growth."""
    st, S = _mk_state(a=1.0, hi=50.0)
    new, _, _, _ = _thermo(st, tair=-30.0, sst=-1.8)
    assert float(new.heff[0].sum()) > float(st.heff[0].sum())


def test_surface_equilibrium_fixed_point():
    """At an exact conductive equilibrium the Ts solve must not move.

    Regression for the linearized surface-balance sign error (starting
    at equilibrium Ts=-20 the broken solve jumped to ~-0.1C)."""
    Ts = jnp.full((3,), -20.0)
    T1 = jnp.full((3,), -15.0)
    Ti = jnp.stack([T1, jnp.full((3,), -10.0), jnp.full((3,), -6.0),
                    jnp.full((3,), -3.0)], axis=-1)
    hi = jnp.full((3,), 100.0)
    hs = jnp.zeros((3,))
    saltz = jnp.asarray(cpts.salinity_profile(4))
    # conductive flux out of the surface at equilibrium
    ki = cpts._conductivity(Ti, saltz)
    dz = hi / 4.0
    k_top = 1.0 / (dz * 0.5 / ki[..., 0])
    fcond = k_top * (Ts - T1)           # negative (heat up out of ice)
    F0 = fcond                           # atm net flux into sfc balances
    dfnet = jnp.full((3,), -3.0e3)       # typical negative sensitivity
    tbot = jnp.full((3,), -1.8)
    has = jnp.ones((3,), bool)
    Ts_n, Ti_n, fct, cb = cpts._vertical_solve(
        Ts, Ti, hi, hs, saltz, -F0, dfnet, 0.0 * Ts, tbot, 1.0, 4, has)
    # one short implicit step from equilibrium: Ts must stay near -20,
    # absolutely not collapse toward 0
    assert float(jnp.abs(Ts_n - Ts).max()) < 2.0


def test_flooding_conserves_column_energy():
    """Snow-to-ice flooding must conserve ice+snow latent energy."""
    nlay = 4
    st = cpts.init_cpts_state(1, nlay, 4, 4, jnp.float64)
    S = cpts.salinity_profile(nlay)
    hi, hs, a = 40.0, 30.0, 1.0      # heavy snow load -> floods
    q = np.asarray(cpts.energy_of_melt(jnp.full((nlay,), -4.0),
                                       jnp.asarray(S)))
    A = jnp.ones((1, 4, 4)) * a
    st = st.replace(A=A, heff=A * hi, hseff=A * hs,
                    Ts=jnp.full((1, 4, 4), -5.0),
                    E=jnp.broadcast_to((q * hi * a / nlay)[None, :, None,
                                                           None],
                                       (1, nlay, 4, 4)))
    new, fl, adj, _ = _thermo(st, tair=-10.0, sst=-1.8, dts=1.0)
    # tiny dts: growth/melt negligible, but flooding is instantaneous.
    # total latent+sensible content: E counts ice; snow counts -RFLSNO*hs
    e0 = float(st.E.sum()) - cpts.RFLSNO * float(st.hseff.sum())
    e1 = float(new.E.sum()) - cpts.RFLSNO * float(new.hseff.sum())
    # flooding happened
    assert float(new.hseff.sum()) < float(st.hseff.sum()) - 1.0
    assert abs(e1 - e0) / abs(e0) < 5e-3


def test_aggregate_matches_totals():
    st, S = _mk_state()
    hice, aice, hsno, tice = cpts.aggregate(st)
    np.testing.assert_allclose(np.asarray(hice), np.asarray(st.heff.sum(0)))
    assert float(aice.max()) <= 1.0


def test_coupled_cpts_segments():
    """Coupled run with the multi-category ice model (O_ice_cpts3)."""
    import dataclasses

    from uvic_tpu.config import small_config
    from uvic_tpu.coupler.driver import CoupledModel

    cfg = small_config()
    cfg = cfg.replace(
        ocean=dataclasses.replace(
            cfg.ocean, isopycmix=False, gent_mcwilliams=False,
            dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8),
        ice=dataclasses.replace(cfg.ice, cpts=3, nlay=4))
    m = CoupledModel(cfg)
    g = m.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    lat = np.broadcast_to(g.yt[:, None], (g.jmt, g.imt))
    sst = np.maximum(29.0 * np.cos(np.deg2rad(lat)) ** 2 - 1.93, -1.93)
    t0[0] = np.where(np.abs(lat)[None] > 60, -1.93,
                     sst[None] * np.exp(-np.asarray(g.zt) / 800e2)
                     [:, None, None])
    t0 *= np.asarray(m.topo.tmask)
    state = m.init_state(t0)
    assert state.cpts is not None
    state = m.run(state, 4)   # 20 model days
    assert not bool(jnp.isnan(state.ocean.t).any())
    assert not bool(jnp.isnan(state.cpts.A).any())
    A = np.asarray(state.cpts.A)
    assert A.sum(0).max() <= 1.0 + 1e-6
    assert A.max() > 0.0                    # ice formed in some category
    assert float(state.cpts.E.max()) <= 0.0  # enthalpy stays physical
    hice = np.asarray(state.ice.hice)
    land = np.asarray(m.embm.tmsk) == 0
    assert hice[land].max() == 0.0
