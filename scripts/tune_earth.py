"""Earth climate tuning harness: run N years, print climate indicators.

Prints per-year: global/zonal SAT and SST structure, extremes, ice
areas, psi max, MOC max, precip-evap balance — the quantities the
EMBM's analytic stand-in fields (coalbedo, diffusivity, land albedo)
are tuned against (the reference reads these from data files that are
not shipped; SURVEY §2.4 setembm.F).

Usage: python scripts/tune_earth.py [years]
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import uvic_tpu

uvic_tpu.enable_compile_cache()


def main(years=5):
    import jax.numpy as jnp
    from uvic_tpu.config import ModelConfig
    from uvic_tpu.coupler.driver import CoupledModel
    from uvic_tpu.diag.energy import meridional_overturning

    cfg = ModelConfig().replace(dtype="float32")
    cfg = cfg.replace(
        ocean=dataclasses.replace(
            cfg.ocean, isopycmix=True, gent_mcwilliams=True,
            tidal_kv=True, gthflx=True, aniso_visc=True,
            aniso_zonal=True),
        embm=dataclasses.replace(cfg.embm, seasonal=True),
        land=dataclasses.replace(cfg.land, enabled=True))
    m = CoupledModel(cfg, topo_kind="earth")
    g = m.grid
    lat = np.asarray(g.yt)
    area = (np.asarray(g.cst)[:, None] * np.asarray(g.dyt)[:, None]
            * np.asarray(g.dxt)[None, :])
    area[:, 0] = 0.0
    area[:, -1] = 0.0
    tmsk = np.asarray(m.embm.tmsk)
    lmsk = 1.0 - tmsk
    oarea = area * tmsk
    larea = area * lmsk

    def zonal(f, w):
        ws = w.sum(1)
        return np.where(ws > 0, (np.asarray(f) * w).sum(1) / np.maximum(
            ws, 1e-30), np.nan)

    def report(state, yr, t0):
        sst = np.asarray(state.ocean.t[0, 0])
        sat = np.asarray(state.atm.at[0])
        aice = np.asarray(state.ice.aice)
        zs_sst = zonal(sst, oarea)
        zs_sat = zonal(sat, area)

        def pick(zb, lats):
            i = [int(np.argmin(np.abs(lat - L))) for L in lats]
            return [round(float(zb[j]), 1) for j in i]

        # MOC from the segment-mean velocity (diagi.F computes
        # overturning from time-averaged fields; instantaneous v at the
        # accelerated dtts carries inertial/leapfrog noise that aliased
        # into the published 100-530 Sv figures)
        v_mean = jnp.asarray(m.last_tavg["v"])
        moc = np.asarray(meridional_overturning(
            v_mean, m.ocean.g, m.ocean.umask)) / 1e12
        nh = (lat > 0)[:, None]
        # TOA / surface energy budget (per-segment accumulators)
        acc = m.last_acc
        tsec = float(acc["time"])
        toa2d = (np.asarray(acc["toa_sw"]) - np.asarray(acc["olr"])) \
            / tsec * 1e-3                                   # W/m^2
        toa_gm = float((toa2d * area).sum() / area.sum())
        olr_gm = float((np.asarray(acc["olr"]) / tsec * 1e-3
                        * area).sum() / area.sum())
        ohf_gm = float((np.asarray(acc["heat"]) / tsec * 1e-3
                        * oarea).sum() / oarea.sum())
        zs_toa = zonal(toa2d, area)
        d = dict(
            yr=yr,
            sat_gm=round(float((sat * area).sum() / area.sum()), 2),
            sat_max=round(float(sat.max()), 1),
            sat_land_max=round(float((sat * lmsk).max()), 1),
            sst_gm=round(float((sst * oarea).sum() / oarea.sum()), 2),
            sst_max=round(float(sst.max()), 1),
            sst_min=round(float(np.where(tmsk > 0, sst, 99.0).min()), 1),
            sst_z=pick(zs_sst, [-65, -60, -30, 0, 30, 60, 75, 85]),
            sat_z=pick(zs_sat, [-85, -60, -30, 0, 30, 60, 85]),
            ice_nh=round(float((aice * oarea * nh).sum()) / 1e16, 1),
            ice_sh=round(float((aice * oarea * ~nh).sum()) / 1e16, 1),
            psi_sv=round(float(np.abs(np.asarray(
                state.ocean.psi0)).max()) / 1e12, 1),
            moc_max=round(float(moc.max()), 1),
            moc_min=round(float(moc.min()), 1),
            toa_gm=round(toa_gm, 2),
            olr_gm=round(olr_gm, 1),
            ohf_gm=round(ohf_gm, 2),
            toa_z=pick(zs_toa, [-85, -60, -30, 0, 30, 60, 85]),
            wall=round(time.time() - t0, 1),
        )
        print(json.dumps(d), flush=True)
        return d

    yrlen = 360.0 if cfg.time.eqyear else 365.0   # ADVICE r4
    seg_per_year = int(round(yrlen / cfg.time.segtim_days))
    state = m.init_state()
    t0 = time.time()
    for yr in range(years):
        for s in range(seg_per_year):
            state = m.run_segment(state)
            m.relyr += cfg.time.segtim_days / yrlen
        d = report(state, yr + 1, t0)
        if not np.isfinite(d["sat_gm"]):
            raise SystemExit("non-finite")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
