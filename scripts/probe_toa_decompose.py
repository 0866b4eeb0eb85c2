"""Decompose the TOA-vs-reservoir discrepancy term by term.

probe_energy.py showed dE/dt ~ +0.1 W/m^2 while the (asw - olr) TOA
diagnostic reports +4 W/m^2 at the year-780 state: the published TOA
diagnostic is biased.  This probe runs segments manually (same step
calls as the fused program) and ledgers every energy pathway:

  expected d(atm heat)  = [asw - swr] - olr + uplwr + upsens
                          + VLOCN*evap + (SLICE-VLOCN)*psno
  expected d(ocn heat)  = acc.heat (the flux the coupler applies)
  land surface residual = lmsk*(swr - uplwr - upltnt - upsens)
  ice latent            = -FLICE * d(ice+snow mass)

and compares each against the measured inventory changes.  The gaps
identify WHERE the diagnostic loses its ~4 W/m^2 (candidates: the
implicit transport solve's conservation, precipitate clipping, land
snow branch, oadj bookkeeping).

Usage: python scripts/probe_toa_decompose.py [segments] [--restart P]
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np

import uvic_tpu

uvic_tpu.enable_compile_cache()

FLICE = 3.34e9


def main(nseg=6, restart="earth_spinup/restart.npz"):
    import jax
    import jax.numpy as jnp
    from uvic_tpu.config import earth_config
    from uvic_tpu.coupler.driver import CoupledModel
    from uvic_tpu.diag.conservation import FullAudit
    from uvic_tpu.io.restart import load_restart
    from uvic_tpu.models.embm import constants as C
    from uvic_tpu.models.embm.insolation import daily_insolation

    cfg = earth_config()
    m = CoupledModel(cfg, topo_kind="earth")
    audit = FullAudit(m)
    area = np.asarray(audit.area, np.float64)          # rows+cols zeroed
    earth_area = area.sum()
    lmsk = np.asarray(m.embm.lmsk, np.float64)
    tmsk = np.asarray(m.embm.tmsk, np.float64)

    state = m.init_state()
    state = load_restart(restart, state)
    import os
    metap = os.path.join(os.path.dirname(restart), "restart_meta.json")
    if os.path.exists(metap):
        m.relyr = json.load(open(metap))["relyr"]

    def atm_heat(at):
        a = np.asarray(at, np.float64)
        return ((a[0] * C.CPATM * C.RHOATM * C.SHT
                 + a[1] * C.RHOATM * C.SHQ * C.VLOCN) * area).sum()

    def ice_mass(ice):
        return ((np.asarray(ice.hice, np.float64)
                 * np.asarray(ice.aice, np.float64) * C.RHOICE
                 + np.asarray(ice.hsno, np.float64) * C.RHOSNO)
                * area).sum()

    def ocn_heat(t):
        rhocp = 4.186e7
        return float(np.asarray(
            jnp.sum(jnp.asarray(t)[0] * audit.dvol), np.float64)) * rhocp

    for seg in range(nseg):
        sst, sss, frzpt = m.gasbc(state)
        u_surf = m.ocean.full_velocity(state.ocean.u, state.ocean.psi0)
        uocn, vocn = u_surf[0, 0], u_surf[1, 0]
        day = (m.relyr % 1.0) * 365.0 + 0.5 * cfg.time.segtim_days
        solins = daily_insolation(m.tlat_rad2d, day, 365.0)
        land_gc = None
        if state.land is not None and state.land.gc is not None:
            land_gc = state.land.gc * 100.0

        atm, ice = state.atm, state.ice
        E_atm0 = atm_heat(atm.at)
        M_ice0 = ice_mass(ice)
        soilm0 = (np.asarray(atm.soilm, np.float64) * lmsk * area).sum()
        acc = None
        srcs = dict(atm_src=0.0, land_res=0.0, toa=0.0, ocn_heat=0.0,
                    snow_fus=0.0, time=0.0)
        for _ in range(m.ntspas):
            mixing = bool(atm.nats + 1 > cfg.embm.namix)
            atm, ice, a, _ = m._atm_ice_step(
                atm, ice, sst, frzpt, uocn, vocn,
                jnp.asarray(0.0, sst.dtype), None, solins, None,
                land_gc, None, None, mixing=mixing)
            acc = a if acc is None else {k: acc[k] + a[k] for k in acc}
            f = {k: np.asarray(a[k], np.float64) for k in
                 ("toa_sw", "olr", "swr", "uplwr", "upsens", "upltnt",
                  "evap", "psno", "precip", "heat", "time")}
            dts = float(f["time"])
            # expected atm heat source [erg/cm^2] over this step
            # (acc fields are already dts-integrated)
            atm_sw = f["toa_sw"] - f["swr"]
            s = (atm_sw - f["olr"] + f["uplwr"] + f["upsens"]
                 + C.VLOCN * f["evap"]
                 + (C.SLICE - C.VLOCN) * f["psno"])
            srcs["atm_src"] += (s * area).sum()
            srcs["land_res"] += ((f["swr"] - f["uplwr"] - f["upltnt"]
                                  - f["upsens"]) * lmsk * area).sum()
            srcs["toa"] += ((f["toa_sw"] - f["olr"]) * area).sum()
            srcs["ocn_heat"] += (f["heat"] * area).sum()
            srcs["snow_fus"] += ((C.SLICE - C.VLOCN) * f["psno"]
                                 * area).sum()
            srcs["time"] += dts

        E_atm1 = atm_heat(atm.at)
        M_ice1 = ice_mass(ice)
        soilm1 = (np.asarray(atm.soilm, np.float64) * lmsk * area).sum()

        # physical elapsed time vs accumulated forcing time (leapfrog
        # applies ~2x): scale expected integrals by phys/acc ratio
        phys_t = m.ntspas * cfg.embm.dtatm
        r = phys_t / srcs["time"]

        def wm2(x):
            return x / phys_t / earth_area * 1e-3     # erg/cm^2 -> W/m^2

        O0 = ocn_heat(state.ocean.t)
        # ocean step
        swr_mean = acc["swr"] / acc["time"]
        st2 = state.replace(atm=atm, ice=ice)
        forcing = m.gosbc(acc, st2, sst, sss, swr_mean, relyr=m.relyr)
        ocean = state.ocean
        for _ in range(m.ntspos):
            lf = bool(np.asarray(ocean.itt) % cfg.ocean.nmix != 0)
            ocean = m.ocean.step(ocean, forcing, leapfrog=lf)
        O1 = ocn_heat(ocean.t)
        state = state.replace(atm=atm, ice=ice, ocean=ocean)
        m.relyr += cfg.time.segtim_days / 365.0

        print(json.dumps(dict(
            seg=seg,
            toa_wm2=round(wm2(srcs["toa"] * r), 3),
            d_atm_wm2=round(wm2(E_atm1 - E_atm0), 3),
            exp_atm_wm2=round(wm2(srcs["atm_src"] * r), 3),
            atm_transport_loss_wm2=round(
                wm2((E_atm1 - E_atm0) - srcs["atm_src"] * r), 3),
            d_ocn_wm2=round(wm2((O1 - O0) * 1.0), 3),
            exp_ocn_wm2=round(wm2(srcs["ocn_heat"] * r), 3),
            land_res_wm2=round(wm2(srcs["land_res"] * r), 3),
            d_ice_lat_wm2=round(wm2(-FLICE * (M_ice1 - M_ice0)), 3),
            d_soilm_kg=round((soilm1 - soilm0) * 1e-3, 3),
            snow_fus_wm2=round(wm2(srcs["snow_fus"] * r), 3),
        )), flush=True)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    restart = "earth_spinup/restart.npz"
    if "--restart" in sys.argv:
        restart = sys.argv[sys.argv.index("--restart") + 1]
        argv = [a for a in argv if a != restart]
    main(int(argv[0]) if argv else 6, restart)
