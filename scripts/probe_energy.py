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

Usage: python scripts/probe_energy.py [years] [--earth] [--restart P]

--earth uses the flagship earth_config; --restart loads a spinup
checkpoint (e.g. earth_spinup/restart.npz) so the reconciliation runs
at the published operating point.
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


def main(years=2, earth=False, restart=None):
    import jax.numpy as jnp
    from uvic_tpu.config import ModelConfig, earth_config
    from uvic_tpu.coupler.driver import CoupledModel
    from uvic_tpu.diag.conservation import FullAudit
    from uvic_tpu.io.restart import load_restart

    if earth:
        cfg = earth_config()
    else:
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
    if restart:
        state = load_restart(restart, state)
        import json as _json
        import os as _os
        metap = _os.path.join(_os.path.dirname(restart),
                              "restart_meta.json")
        if _os.path.exists(metap):
            with open(metap) as f:
                m.relyr = _json.load(f)["relyr"]
    E0, inv0 = total_E(state)
    t0 = time.time()
    yr_s = 365.0 * 86400.0
    from uvic_tpu.models.embm import constants as C
    lmsk_np = np.asarray(m.embm.lmsk, np.float64)
    FLICE_E = C.SLICE - C.VLOCN
    phys_seg = m.ntspas * cfg.embm.dtatm     # physical seconds/segment

    def atm_heat_J(at):
        a = np.asarray(at, np.float64)
        return float(((a[0] * C.CPATM * C.RHOATM * C.SHT
                       + a[1] * C.RHOATM * C.SHQ * C.VLOCN)
                      * area_np).sum()) * 1e-7

    for yr in range(years):
        toa_int = 0.0     # area-integrated J over the year
        ohf_int = 0.0
        exp_atm_int = 0.0   # expected atm-source integral [J]
        land_res_int = 0.0
        E_atm0 = atm_heat_J(state.atm.at)
        for s in range(seg_per_year):
            state = m.run_segment(state)
            m.relyr += cfg.time.segtim_days / 365.0
            acc = m.last_acc
            f = {k: np.asarray(acc[k], np.float64) for k in
                 ("toa_sw", "olr", "swr", "uplwr", "upsens", "upltnt",
                  "evap", "psno", "heat", "time")}
            # leapfrog accumulates ~2x dts: rescale to physical time
            r = phys_seg / float(f["time"])
            toa2d = f["toa_sw"] - f["olr"]
            toa_int += float((toa2d * area_np).sum()) * 1e-7 * r
            ohf_int += float((f["heat"] * area_np).sum()) * 1e-7 * r
            exp_atm = ((f["toa_sw"] - f["swr"]) - f["olr"] + f["uplwr"]
                       + f["upsens"] + C.VLOCN * f["evap"]
                       + FLICE_E * f["psno"])
            exp_atm_int += float((exp_atm * area_np).sum()) * 1e-7 * r
            land_res = (f["swr"] - f["uplwr"] - f["upltnt"]
                        - f["upsens"]) * lmsk_np
            land_res_int += float((land_res * area_np).sum()) * 1e-7 * r
        E_atm1 = atm_heat_J(state.atm.at)
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
            atm_transport_loss_wm2=round(
                ((E_atm1 - E_atm0) - exp_atm_int) / yr_s
                / earth_area * 1e7 * 1e-3, 3),
            land_res_wm2=round(
                land_res_int / yr_s / earth_area * 1e7 * 1e-3, 3),
            sat_gm=round(float(jnp.mean(state.atm.at[0])), 2),
            wall=round(time.time() - t0, 1),
        )), flush=True)
        E0, inv0 = E1, inv1


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    restart = None
    if "--restart" in sys.argv:
        restart = sys.argv[sys.argv.index("--restart") + 1]
        argv = [a for a in argv if a != restart]
    main(int(argv[0]) if argv else 2,
         earth="--earth" in sys.argv, restart=restart)
