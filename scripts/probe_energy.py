"""Energy-closure probe for the earth config.

Compares, per model year:
  dE = change of the total heat reservoir
       (atm sensible+latent + ocean heat - FLICE*(ice+snow mass))
  vs the annual-integrated TOA diagnostic (asw - olr)
  vs the annual-integrated ocean surface heat flux.

If dE != TOA integral, the coupled system leaks energy internally (or
the TOA diagnostic is mis-specified); if they match, a negative TOA
with rising SAT means the ocean interior is cooling (initial state
warmer than equilibrium at depth).

Usage: python scripts/probe_energy.py [years]
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import uvic_tpu

uvic_tpu.enable_compile_cache()

FLICE = 3.34e9


def main(years=2):
    import jax.numpy as jnp
    from uvic_tpu.config import ModelConfig
    from uvic_tpu.coupler.driver import CoupledModel
    from uvic_tpu.diag.conservation import FullAudit

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
    audit = FullAudit(m)
    area_np = np.asarray(audit.area, np.float64)
    earth_area = float(area_np.sum())                    # cm^2
    ocean_area = float(np.asarray(audit.ocean_area, np.float64).sum())

    def total_E(state):
        """System heat reservoir [J]."""
        inv = audit.inventories(state)
        ice_kg = inv["ice_water_kg"]
        E = (inv["atm_heat_J"] + inv["ocn_heat_J"]
             - FLICE * 1e-7 * ice_kg * 1e3)   # kg -> g, erg -> J
        return E, inv

    seg_per_year = int(round(365.0 / cfg.time.segtim_days))
    state = m.init_state()
    E0, inv0 = total_E(state)
    t0 = time.time()
    yr_s = 365.0 * 86400.0
    for yr in range(years):
        toa_int = 0.0     # area-integrated J over the year
        ohf_int = 0.0
        for s in range(seg_per_year):
            state = m.run_segment(state)
            m.relyr += cfg.time.segtim_days / 365.0
            acc = m.last_acc
            toa2d = np.asarray(acc["toa_sw"] - acc["olr"], np.float64)
            toa_int += float((toa2d * area_np).sum()) * 1e-7   # J
            ohf_int += float((np.asarray(acc["heat"], np.float64)
                              * area_np).sum()) * 1e-7
        E1, inv1 = total_E(state)
        print(json.dumps(dict(
            yr=yr + 1,
            dE_wm2=round((E1 - E0) / yr_s / earth_area * 1e7 * 1e-3, 3),
            toa_wm2=round(toa_int / yr_s / earth_area * 1e7 * 1e-3, 3),
            ohf_wm2_ocean=round(
                ohf_int / yr_s / ocean_area * 1e7 * 1e-3, 3),
            d_ocn_heat_wm2=round(
                (inv1["ocn_heat_J"] - inv0["ocn_heat_J"]) / yr_s
                / earth_area * 1e7 * 1e-3, 3),
            d_atm_heat_wm2=round(
                (inv1["atm_heat_J"] - inv0["atm_heat_J"]) / yr_s
                / earth_area * 1e7 * 1e-3, 3),
            d_ice_latent_wm2=round(
                -FLICE * 1e-4 * (inv1["ice_water_kg"]
                                 - inv0["ice_water_kg"]) / yr_s
                / earth_area * 1e-3, 3),
            sat_gm=round(float(jnp.mean(state.atm.at[0])), 2),
            wall=round(time.time() - t0, 1),
        )), flush=True)
        E0, inv0 = E1, inv1


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
