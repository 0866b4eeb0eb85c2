"""Per-process tests for the full MOBI kinetics (mobi.F port).

Each test pins one reference process against a property the mobi.F
equations guarantee: phosphorus closure under variable stoichiometry,
Redfield N:P drawdown, iron limitation of growth, Omega-dependent
calcite dissolution, Pa/Th scavenging partition, and c13
fractionation at production.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import mobi_full, small_config
from uvic_tpu.models.ocean.model import make_ocean


@pytest.fixture(scope="module")
def mobi_model():
    cfg = small_config()
    cfg = cfg.replace(
        ocean=dataclasses.replace(cfg.ocean, isopycmix=False,
                                  gent_mcwilliams=False, dtts=3600.0,
                                  dtuv=900.0, dtsf=900.0, tolrsf=1e8),
        bgc=mobi_full())
    return make_ocean(cfg)


def _healthy_state(m, temp=15.0):
    g = m.params.grid
    idx = m.tracer_index
    t = np.zeros((m.nt, g.km, g.jmt, g.imt))
    for i, tr in enumerate(idx.tracers):
        t[i] = tr.init
    t[idx.itemp] = temp
    return jnp.asarray(t * np.asarray(m.params.topo.tmask))


def _sources(m, t, swr=200.0e3, relyr=0.45):
    g = m.params.grid
    z2 = jnp.zeros((g.jmt, g.imt))
    mob = m.npzd[True]
    return np.asarray(mob.sources(
        t, m.kmt, m.tmask, jnp.full((g.jmt, g.imt), swr), z2, z2, z2,
        m.tlat_rad, relyr))


def test_no_nan_and_masked(mobi_model):
    m = mobi_model
    src = _sources(m, _healthy_state(m))
    assert not np.isnan(src).any()
    tmask = np.asarray(m.params.topo.tmask)
    assert np.all(src[2:] * (1.0 - tmask) == 0.0)


def test_phosphorus_closure(mobi_model):
    """Variable-stoichiometry P accounting closes to round-off:
    explicit P pools (po4, dop, phyt_phos, detr_phos) plus the
    Redfield-implicit zoop/diat and diaz (N:P=28) pools
    (mobi_src:2704-2800 prognostic equations)."""
    m = mobi_model
    idx = m.tracer_index
    mob = m.npzd[True]
    src = _sources(m, _healthy_state(m))
    rp, dptn = mob.redptn, mob.diazptn
    P = (src[idx["po4"]] + src[idx["dop"]] + src[idx["phyt_phos"]]
         + src[idx["detr_phos"]] + rp * src[idx["zoop"]]
         + dptn * src[idx["diaz"]] + rp * src[idx["diat"]])
    dz = np.asarray(m.params.grid.dzt)[:, None, None]
    col = np.abs((P * dz).sum(0)).max()
    scale = np.abs(src[idx["po4"]] * dz).sum(0).max()
    assert col < 1e-10 * max(scale, 1e-30)


def test_redfield_np_drawdown(mobi_model):
    """Surface NO3:PO4 uptake ratio ~ 16 (GM15 variable ratio stays
    near Redfield at these PO4 levels)."""
    m = mobi_model
    idx = m.tracer_index
    src = _sources(m, _healthy_state(m))
    wet = np.asarray(m.params.topo.tmask)[0] > 0
    dno3 = src[idx["no3"]][0][wet].mean()
    dpo4 = src[idx["po4"]][0][wet].mean()
    assert dno3 < 0 and dpo4 < 0          # surface uptake
    ratio = dno3 / dpo4
    assert 10.0 < ratio < 22.0


def test_iron_limitation(mobi_model):
    """Lower dissolved iron -> weaker phytoplankton growth (deffe
    limitation, mobi_src:2010-2030)."""
    m = mobi_model
    idx = m.tracer_index
    t_hi = _healthy_state(m)
    t_lo = t_hi.at[idx["dfe"]].set(
        t_hi[idx["dfe"]] * 0.02)          # severe Fe stress
    s_hi = _sources(m, t_hi)
    s_lo = _sources(m, t_lo)
    wet = np.asarray(m.params.topo.tmask)[0] > 0
    npp_hi = s_hi[idx["phyt"]][0][wet].mean()
    npp_lo = s_lo[idx["phyt"]][0][wet].mean()
    assert npp_lo < 0.5 * npp_hi


def test_caco3_omega_dissolution(mobi_model):
    """Calcite dissolution switches on where Omega_c < 1: stripping
    alkalinity makes deep water corrosive and the caco3 sink grows
    (dissk1 = dissk0*max(0, 1-Omega_c), mobi_driver:763)."""
    m = mobi_model
    idx = m.tracer_index
    t = _healthy_state(m, temp=4.0)
    t_corr = t.at[idx.ialk].set(t[idx.ialk] * 0.82)   # corrosive
    s_sup = _sources(m, t)
    s_cor = _sources(m, t_corr)
    kbot = int(np.asarray(m.kmt).max()) - 1
    wet = np.asarray(m.params.topo.tmask)[kbot] > 0
    # same caco3 standing stock, so stronger dissolution -> larger
    # (more positive) deep DIC source and a more negative caco3 source
    assert (s_cor[idx["caco3"]][kbot][wet].mean()
            < s_sup[idx["caco3"]][kbot][wet].mean())
    assert (s_cor[idx.idic][kbot][wet].mean()
            > s_sup[idx.idic][kbot][wet].mean())


def test_pa_th_scavenging(mobi_model):
    """Reversible scavenging: with particles Pa/Th net source drops
    below the production-decay balance; without particles it
    approaches beta - lambda*A (protac_thor.F:495-545)."""
    m = mobi_model
    idx = m.tracer_index
    from uvic_tpu.models.bgc.mobi import BETA_TH, LAMBDA_TH
    t = _healthy_state(m)
    # particle-free column
    t_clean = t
    for n in ("detr", "caco3", "opl"):
        t_clean = t_clean.at[idx[n]].set(
            jnp.full_like(t_clean[idx[n]], 1e-11)
            * (t_clean[idx[n]] != 0))
    s_dirty = _sources(m, t.at[idx["detr"]].set(
        t[idx["detr"]] * 0 + 0.5 * (t[idx["detr"]] != 0)))
    s_clean = _sources(m, t_clean)
    wet = np.asarray(m.params.topo.tmask)[0] > 0
    th0 = float(t[idx["th230"]][0][wet].mean())
    expect = BETA_TH - LAMBDA_TH * th0
    got = s_clean[idx["th230"]][0][wet].mean()
    assert abs(got - expect) < 0.2 * abs(expect)
    # heavy particle load scavenges Th out of the surface faster
    assert s_dirty[idx["th230"]][0][wet].mean() < got


def test_c13_fractionation_sign(mobi_model):
    """Photosynthesis discriminates against 13C: the organic 13C/12C
    production ratio is below the ambient DIC ratio (ac13b < 1,
    mobi_driver:745-752)."""
    m = mobi_model
    idx = m.tracer_index
    src = _sources(m, _healthy_state(m))
    wet = np.asarray(m.params.topo.tmask)[0] > 0
    mob = m.npzd[True]
    # production ratio = d(phytc13)/(redctn*d(phyt)) for a pure-growth
    # surface cell; compare against the ambient ratio
    dphyt = src[idx["phyt"]][0][wet]
    dphyt13 = src[idx["phytc13"]][0][wet]
    grow = dphyt > 1e-12
    r_prod = (dphyt13[grow] / (mob.redctn * dphyt[grow])).mean()
    t = _healthy_state(m)
    r_dic = float((t[idx["dic13"]] / t[idx.idic])[0][
        np.asarray(m.params.topo.tmask)[0] > 0].mean())
    # the net phyt source mixes fcnpp-fractionated production
    # (~ -19 permil via ac13b) with losses recycled at the pool
    # ratio, so the NET ratio sits below ac13b but above ~ -60 permil
    assert 0.90 < r_prod / r_dic < 0.999


def test_o2_source_sign(mobi_model):
    """Net production at the surface releases O2; remineralization at
    depth consumes it with the OCMIP tanh limiter
    (mobi_driver:1283-1345)."""
    m = mobi_model
    idx = m.tracer_index
    src = _sources(m, _healthy_state(m))
    wet0 = np.asarray(m.params.topo.tmask)[0] > 0
    assert src[idx.io2][0][wet0].mean() > 0


def test_carbonate_pressure_effect():
    """Omega_c decreases with depth at fixed T/S/DIC/ALK (Millero
    pressure corrections, co2calc.F:374-388)."""
    from uvic_tpu.models.bgc.gasx import co2calc_sws
    t = jnp.full((4,), 4.0)
    s = jnp.full((4,), 35.0)
    dic = jnp.full((4,), 2.30)
    alk = jnp.full((4,), 2.40)
    depth = jnp.asarray([0.0, 1000.0, 3000.0, 5000.0])
    out = co2calc_sws(t, s, dic, alk, 280.0, depth_m=depth)
    om = np.asarray(out["omega_c"])
    assert np.all(np.diff(om) < 0)
    assert om[0] > 1.0 and om[-1] < 1.0
