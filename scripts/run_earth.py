"""Coupled Earth acceptance run (VERDICT r2 #4 "world-data config").

Runs the coupled model on the in-repo real-Earth geography
(core/earth.py) for N model years on the attached accelerator and
reports the climate-credibility diagnostics:

- Atlantic meridional overturning (NADW-style deep max, Sv),
- global/tropical/polar SST structure,
- NH/SH sea-ice area with the seasonal cycle of the final year.

Usage: python scripts/run_earth.py [years] [outfile.json]
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import uvic_tpu

uvic_tpu.enable_compile_cache()


def main(years=10, out="earth_run.json"):
    import jax
    import jax.numpy as jnp
    from uvic_tpu.config import ModelConfig
    from uvic_tpu.core.earth import atlantic_mask
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
    amask = jnp.asarray(atlantic_mask(g), m.cfg.np_dtype)
    area = (np.asarray(g.cst)[:, None] * np.asarray(g.dyt)[:, None]
            * np.asarray(g.dxt)[None, :])
    area[:, 0] = 0.0
    area[:, -1] = 0.0
    area_j = jnp.asarray(area, m.cfg.np_dtype)
    area_all = area_j   # full-sphere area weights (land + ocean)
    lat = np.broadcast_to(np.asarray(g.yt)[:, None], area.shape)
    nh = jnp.asarray((lat > 0) * area, m.cfg.np_dtype)
    sh = jnp.asarray((lat < 0) * area, m.cfg.np_dtype)
    tmsk = m.embm.tmsk

    def diags(state):
        sst = state.ocean.t[0, 0]
        osum = jnp.sum(tmsk * area_j)
        # MOC from segment-mean velocity (diagi.F averages; the
        # instantaneous field aliases leapfrog/inertial noise)
        v_mean = m.last_tavg["v"]
        moc = meridional_overturning(v_mean, m.ocean.g, m.ocean.umask)
        moc_atl = meridional_overturning(
            v_mean, m.ocean.g, m.ocean.umask * amask[None])
        zt = np.asarray(g.zt)
        deep = jnp.asarray(zt >= 500.0e2)[:, None]
        jlat = jnp.asarray((np.asarray(g.yu) > 20.0)
                           & (np.asarray(g.yu) < 70.0))[None, :]
        return dict(
            sst_mean=float(jnp.sum(sst * tmsk * area_j) / osum),
            sst_trop=float(jnp.max(sst)),
            sat_mean=float(jnp.mean(state.atm.at[0])),
            ice_area_nh_1e6km2=float(
                jnp.sum(state.ice.aice * tmsk * nh)) / 1e16,
            ice_area_sh_1e6km2=float(
                jnp.sum(state.ice.aice * tmsk * sh)) / 1e16,
            moc_global_max_sv=float(jnp.max(moc)) / 1e12,
            moc_atl_deep_max_sv=float(jnp.max(
                jnp.where(deep & jlat, moc_atl, -jnp.inf))) / 1e12,
            psi_max_sv=float(jnp.abs(state.ocean.psi0).max()) / 1e12,
            toa_wm2=float(jnp.sum(
                (m.last_acc["toa_sw"] - m.last_acc["olr"])
                / m.last_acc["time"] * 1e-3 * area_all)
                / jnp.sum(area_all)),
            ohf_wm2=float(jnp.sum(
                m.last_acc["heat"] / m.last_acc["time"] * 1e-3
                * tmsk * area_j) / osum),
        )

    seg_days = cfg.time.segtim_days
    yrlen = 360.0 if cfg.time.eqyear else 365.0   # ADVICE r4
    seg_per_year = int(round(yrlen / seg_days))
    state = m.init_state()

    t0 = time.time()
    yearly = []
    final_year = []
    for yr in range(years):
        for s in range(seg_per_year):
            state = m.run_segment(state)
            m.relyr += seg_days / yrlen
            if yr == years - 1 and s % 6 == 0:   # ~monthly, final year
                d = diags(state)
                final_year.append(dict(
                    doy=round((s + 1) * seg_days, 1),
                    ice_nh=d["ice_area_nh_1e6km2"],
                    ice_sh=d["ice_area_sh_1e6km2"]))
        d = diags(state)
        d["year"] = yr + 1
        d["wall_s"] = round(time.time() - t0, 1)
        yearly.append(d)
        print(json.dumps(d), flush=True)
        if not np.isfinite(d["sst_mean"]):
            raise RuntimeError("non-finite state")

    summary = dict(years=years, yearly=yearly, final_year_ice=final_year,
                   wall_s=round(time.time() - t0, 1))
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    yrs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "earth_run.json"
    main(yrs, out)
