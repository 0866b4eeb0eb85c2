"""Restart exactness, tsi/tavg, conservation audit, calendar tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.core.calendar import Alarm, Switches, TimeManager
from uvic_tpu.coupler.driver import CoupledModel
from uvic_tpu.diag.conservation import ConservationAudit
from uvic_tpu.diag.tsi import TsiDiagnostics
from uvic_tpu.io.netcdf import read_var, write_tavg
from uvic_tpu.io.restart import load_restart, save_restart
from uvic_tpu.io.tavg import TavgAccumulator, coupled_tavg_fields


@pytest.fixture(scope="module")
def coupled():
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8))
    return CoupledModel(cfg)


def test_restart_exactness(coupled, tmp_path):
    """A split run must reproduce a continuous run bit-for-bit
    (SURVEY.md §4.5; the restart carries both leapfrog levels)."""
    m = coupled
    s = m.init_state()
    s = m.run(s, 2)
    save_restart(tmp_path / "rest.npz", s)
    s_cont = m.run(s, 2)
    s_loaded = load_restart(str(tmp_path / "rest.npz") , m.init_state())
    s_split = m.run(s_loaded, 2)
    for name in ("t", "u", "psi0", "ptd"):
        a = np.asarray(getattr(s_cont.ocean, name))
        b = np.asarray(getattr(s_split.ocean, name))
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(s_cont.atm.at),
                                  np.asarray(s_split.atm.at))
    np.testing.assert_array_equal(np.asarray(s_cont.ice.hice),
                                  np.asarray(s_split.ice.hice))


def test_tsi_and_conservation(coupled):
    m = coupled
    s = m.init_state()
    tsi = TsiDiagnostics(m.ocean, m.embm)
    audit = ConservationAudit(m.ocean)
    inv0 = audit.inventories(s.ocean)
    row = tsi.compute(s.ocean, s.atm, s.ice)
    assert 0 < row["o_tbar"] < 30
    assert 30 < row["o_sbar"] < 40
    s = m.run(s, 1)
    row2 = tsi.compute(s.ocean, s.atm, s.ice)
    assert np.isfinite(list(row2.values())).all()
    inv1 = audit.inventories(s.ocean)
    drift = audit.drift(inv0, inv1)
    # heat changes through surface fluxes but stays small over 5 days
    assert abs(drift["heat"]) < 1e-2


def test_tavg_and_netcdf(coupled, tmp_path):
    m = coupled
    s = m.init_state()
    acc = TavgAccumulator()
    acc.accumulate(coupled_tavg_fields(m, s))
    s = m.run(s, 1)
    acc.accumulate(coupled_tavg_fields(m, s))
    means = acc.normalize()
    assert acc.n == 0 and means["temp"].ndim == 3
    path = str(tmp_path / "tavg.nc")
    write_tavg(path, m.grid, means, time_days=5.0)
    back = read_var(path, "temp")
    np.testing.assert_allclose(back[0], means["temp"], rtol=1e-6)


def test_calendar():
    tm = TimeManager(eqyear=True)
    for _ in range(360 * 2):
        tm.increment(86400.0)
    y, mo, d, *_ = tm.date
    assert (y, mo, d) == (2, 1, 1)
    al = Alarm(10.0)
    fires = sum(al.check(d * 1.25, 1.25) for d in range(1, 65))
    assert fires == 8   # 80 model days / 10-day interval


def test_sections_and_stations():
    """xbt stations, cross sections, zonal-mean SBC (xbt.F, diag.F)."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from uvic_tpu.config import small_config
    from uvic_tpu.diag.sections import (XbtStations, cross_section,
                                        zonal_mean_sbc)
    from uvic_tpu.models.ocean.model import make_forcing, make_ocean

    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=3600.0, dtuv=900.0, dtsf=900.0, tolrsf=1e8))
    m = make_ocean(cfg)
    g = m.params.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m.params.topo.tmask)
    s = m.init_state(t0)
    yu = np.asarray(g.yu)
    taux = np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    f = make_forcing(jnp.asarray(np.stack([taux / 1.035,
                                           np.zeros_like(taux)])),
                     jnp.zeros((m.nt, g.jmt, g.imt)))
    s = m.run(s, f, 5)

    xbt = XbtStations(g)
    cols = xbt.sample(s, m)
    assert set(cols) == {n for n, _, _ in XbtStations.DEFAULT}
    for st in cols.values():
        assert st["temp"].shape == (g.km,)
        assert np.isfinite(st["temp"]).all()

    sec = cross_section(s.t[0], g, lat=0.0)
    assert sec.shape == (g.km, g.imt)
    sec2 = cross_section(s.t[0], g, lon=180.0)
    assert sec2.shape == (g.km, g.jmt)

    zm = zonal_mean_sbc(dict(sst=s.t[0, 0], taux=f.smf[0]),
                        m.tmask[0], g.dxt)
    assert zm["sst"].shape == (g.jmt,)
    assert np.isfinite(zm["sst"][1:-1]).all()


def test_regrid_and_extrap():
    """util.F ctf/ftc/extrap equivalents (io/regrid.py)."""
    import numpy as np
    from uvic_tpu.io.regrid import ctf, extrap_fill, ftc

    # extrap: masked region fills smoothly between boundary values
    f = np.zeros((8, 10))
    valid = np.zeros((8, 10), bool)
    f[:, 0] = 1.0
    f[:, 5] = 3.0
    valid[:, 0] = True
    valid[:, 5] = True
    out = extrap_fill(f, valid, cyclic=False, max_iter=2000, tol=1e-8)
    assert np.all(out[:, 1:5] > 1.0) and np.all(out[:, 1:5] < 3.0)
    assert np.allclose(out[:, 0], 1.0)

    # ctf: bilinear recovery of a linear field is exact (incl. the seam)
    slon = np.arange(0, 360, 10.0) + 5.0
    slat = np.linspace(-85, 85, 18)
    src = np.sin(np.deg2rad(slat))[:, None] * np.ones((18, 36))
    dlon = np.arange(0, 360, 3.6) + 1.8
    dlat = np.linspace(-88, 88, 50)
    out = ctf(src, slon, slat, dlon, dlat)
    expect = np.sin(np.deg2rad(np.clip(dlat, slat[0], slat[-1])))
    assert np.abs(out - expect[:, None]).max() < 0.02

    # ftc: box means of a constant are exactly the constant
    fine_lon = np.arange(0, 360, 1.0) + 0.5
    fine_lat = np.linspace(-89.5, 89.5, 180)
    fine = np.full((180, 360), 7.5)
    lon_edges = np.arange(0, 361, 30.0)
    lat_edges = np.linspace(-90, 90, 7)
    out = ftc(fine, fine_lon, fine_lat, lon_edges, lat_edges)
    assert np.allclose(out, 7.5)


def test_stability_monitor_stabf_parity():
    """stab.F-parity monitor: CFL percent-of-limit, grid Reynolds and
    Peclet maxima with argmax offender locations (stab.F:74-281).

    A velocity spike planted at a known cell must be found by the
    monitor's location bookkeeping, and the CFL fraction must match the
    hand-computed 100*|u| dt / (0.5 dx)."""
    import numpy as np
    import jax.numpy as jnp
    from uvic_tpu.config import small_config
    from uvic_tpu.models.ocean.model import make_ocean
    from uvic_tpu.diag.stability import StabilityMonitor

    m = make_ocean(small_config(imt=40, jmt=34, km=8))
    g = m.params.grid
    mon = StabilityMonitor(m)
    state = m.init_state(np.zeros((2, g.km, g.jmt, g.imt)))

    # plant a zonal spike at a wet interior cell
    umask = np.asarray(m.umask)
    k0, j0, i0 = 2, 17, 12
    assert umask[k0, j0, i0] == 1.0
    u = np.zeros((2, g.km, g.jmt, g.imt))
    u[0, k0, j0, i0] = 30.0
    state = state.replace(u=jnp.asarray(u))

    d = mon.check(state)
    # location found (depth_km, lat, lon)
    expect = (round(float(np.asarray(g.zt)[k0] / 1e5), 2),
              round(float(np.asarray(g.yt)[j0]), 1),
              round(float(np.asarray(g.xt)[i0]), 1))
    assert d["cflu_at"] == expect, (d["cflu_at"], expect)
    assert d["reyx_at"] == expect
    assert d["pecx_at"] == expect

    # CFL fraction matches the stab.F limit definition
    dtmax = max(m.cfg.ocean.dtuv, m.cfg.ocean.dtts)
    umax = 0.5 * float(np.asarray(g.csu)[j0]) \
        * float(np.asarray(g.dxu)[i0]) / dtmax
    assert abs(d["cflu"] - 100.0 * 30.0 / umax) < 1e-6 * d["cflu"]
    # Reynolds = |u| dx / am
    rey = 30.0 * float(np.asarray(g.dxu)[i0]) / m.cfg.ocean.am
    assert abs(d["reyx"] - rey) < 1e-6 * rey
    assert d["n_cfl_violations"] >= 0.0
    # report line formats without error
    line = mon.report(state)
    assert "Re x=" in line and "viol=" in line


def test_regions_setcom_machinery():
    """setcom.F region machinery: named basin/vertical regions with
    nearest-level setvr fitting, one-hot masks, area/volume
    bookkeeping, and the region.F product-average reduction; the
    term-balance path now consumes NAMED regions instead of ad-hoc
    masks (VERDICT r3 missing #6)."""
    import numpy as np
    import jax.numpy as jnp
    from uvic_tpu.config import ModelConfig
    from uvic_tpu.models.ocean.model import make_ocean
    from uvic_tpu.diag.regions import build_regions, setvr

    m = make_ocean(ModelConfig(), topo_kind="earth")
    g = m.params.grid
    reg = build_regions(g, m.params.topo.kmt)
    assert reg.nhreg == 5 and reg.nvreg == 2
    # every wet cell belongs to exactly one region
    wet = np.asarray(m.params.topo.kmt) > 0
    ids = np.asarray(reg.mskhr)
    assert (ids[wet] >= 1).all() and (ids[wet] <= 5).all()
    assert (ids[~wet] == 0).all()
    # Atlantic area is a sensible fraction of the ocean
    areab = np.asarray(reg.areab)
    assert 0.1 < areab[1] / areab.sum() < 0.4
    # volumes: sum over regions == total wet volume
    dvol = np.asarray(reg._dvol)
    np.testing.assert_allclose(float(np.asarray(reg.volbt).sum()),
                               dvol.sum(), rtol=1e-12)
    # setvr nearest-level fit: the two default regions cover all levels
    mskvr = np.asarray(reg.mskvr)
    assert set(mskvr.tolist()) == {1, 2}
    assert setvr(np.asarray(g.zw)[:g.km], [(0.0, 1e9)]).min() == 1

    # region.F product average: a field equal to its region id must
    # average back to the id in every (h, v) cell
    km, jmt, imt = g.km, g.jmt, g.imt
    f = np.broadcast_to(ids[None], (km, jmt, imt)).astype(float)
    means = np.asarray(reg.volume_mean(jnp.asarray(f)))
    for r in range(5):
        if np.asarray(reg.volbt)[r] > 0:
            np.testing.assert_allclose(means[r], r + 1.0, rtol=1e-10)

    # named-region term balance: tendencies reduce per basin
    from uvic_tpu.diag.energy import tracer_term_balance
    t_new = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, km, jmt, imt)))
    t_old = t_new * 0.5
    tb = tracer_term_balance(t_new, t_old, 1000.0, reg.hmask, m.g,
                             m.tmask)
    assert tb.shape == (5, 2)
    assert np.isfinite(np.asarray(tb)).all()


def test_tavg_catalog_breadth_and_finiteness():
    """mom_tavg.F/embm_tavg.F parity (VERDICT r4 #6): the per-segment
    time-mean catalog carries >= 45 rows — state means, flux-bus means,
    per-face advective/diffusive heat fluxes, GM bolus velocities,
    effective vertical diffusivity, convection extent, ice velocity —
    and every row is finite after a segment."""
    import dataclasses

    import numpy as np

    from uvic_tpu.config import BgcConfig, small_config
    from uvic_tpu.coupler.driver import CoupledModel

    cfg = small_config()
    cfg = cfg.replace(
        ocean=dataclasses.replace(cfg.ocean, isopycmix=True,
                                  gent_mcwilliams=True, dtts=43200.0,
                                  dtuv=1800.0, dtsf=1800.0,
                                  tolrsf=1e8),
        bgc=BgcConfig(suite="npzd", carbon=True, alk=True, o2=True),
        land=dataclasses.replace(cfg.land, enabled=True))
    m = CoupledModel(cfg)
    state = m.init_state()
    state = m.run_segment(state)
    rows = m.last_tavg
    assert len(rows) >= 45, sorted(rows)
    for name, v in rows.items():
        arr = np.asarray(v)
        assert np.isfinite(arr).all(), f"tavg row {name} not finite"
    for required in ("temp", "salt", "u", "v", "w", "rho", "psi",
                     "adv_fe_temp", "adv_fn_temp", "adv_fb_temp",
                     "dif_fe_temp", "dif_fn_temp", "dif_fb_temp",
                     "vetiso", "vntiso", "wbtiso", "diff_cbt_eff",
                     "convect_depth", "convect_nreg", "hflx", "sflx",
                     "taux", "tauy", "sat", "shum", "hice", "aice",
                     "hsno", "uice", "vice", "soilm", "tice", "precip",
                     "evap", "runoff", "olr", "swr", "uplwr", "upsens",
                     "upltnt", "psno", "wspd", "toa_sw", "m_soil",
                     "lying_snow", "tsoil", "cs", "veg_frac", "nep"):
        assert required in rows, required
