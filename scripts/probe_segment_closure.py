"""Close the ocean heat budget over ONE coupled earth segment.

Replicates driver._segment_core step by step with the public API
(atm/ice substeps -> gosbc forcing -> ocean substeps), so the exact
forcing is in hand, then checks
    d(ocean heat inventory) == sum(stf+btf+bhf)*area*time.

Also runs the fused run_segment from the same initial state and
compares the final ocean heat, isolating any fused-path divergence.

Usage: python scripts/probe_segment_closure.py [spinup_segments]
"""

import dataclasses
import json
import sys

sys.path.insert(0, ".")

import numpy as np

import uvic_tpu

uvic_tpu.enable_compile_cache()


def main(spinup=30):
    import jax
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
    audit = FullAudit(m)
    state = m.init_state()
    for _ in range(spinup):
        state = m.run_segment(state)
        m.relyr += cfg.time.segtim_days / 365.0

    # ---- manual segment --------------------------------------------
    sst, sss, frzpt = m.gasbc(state)
    u_surf = m.ocean.full_velocity(state.ocean.u, state.ocean.psi0)
    uocn, vocn = u_surf[0, 0], u_surf[1, 0]
    from uvic_tpu.models.embm.insolation import daily_insolation
    day = (m.relyr % 1.0) * 365.0 + 0.5 * cfg.time.segtim_days
    solins = daily_insolation(m.tlat_rad2d, day, 365.0)

    atm, ice = state.atm, state.ice
    acc = None
    land_gc = None
    if state.land is not None and state.land.gc is not None:
        land_gc = state.land.gc * 100.0
    for _ in range(m.ntspas):
        mixing = bool(atm.nats + 1 > cfg.embm.namix)
        atm, ice, a, _ = m._atm_ice_step(
            atm, ice, sst, frzpt, uocn, vocn,
            jnp.asarray(0.0, sst.dtype), None, solins, None, land_gc,
            None, None, mixing=mixing)
        acc = a if acc is None else {k: acc[k] + a[k] for k in acc}

    swr_mean = acc["swr"] / acc["time"]
    st2 = state.replace(atm=atm, ice=ice)
    forcing = m.gosbc(acc, st2, sst, sss, swr_mean,
                      relyr=m.relyr)

    before_t = np.asarray(state.ocean.t, np.float64)
    ocean = state.ocean
    for _ in range(m.ntspos):
        lf = bool(ocean.itt % cfg.ocean.nmix != 0)
        ocean = m.ocean.step(ocean, forcing, leapfrog=lf)

    errs = audit.ocean_closure(before_t, ocean.t, forcing, m.ntspos,
                               cfg.ocean.dtts)
    # include geothermal in the expected flux by hand
    dvol = audit.dvol
    d_heat = float(jnp.einsum(
        "kji,kji->", jnp.asarray(np.asarray(ocean.t[0], np.float64)
                                 - before_t[0], jnp.float64),
        jnp.asarray(dvol, jnp.float64)))
    area64 = np.asarray(audit.ocean_area, np.float64)
    applied = float((np.asarray(forcing.stf[0], np.float64)
                     * area64).sum()) * m.ntspos * cfg.ocean.dtts
    bhf_int = 0.0
    if m.ocean.bhf is not None:
        bhf_int = float((np.asarray(m.ocean.bhf, np.float64)
                         * np.asarray(m.ocean.tmask[0][0], np.float64)
                         * area64).sum()) * m.ntspos * cfg.ocean.dtts
    seg_s = m.ntspos * cfg.ocean.dtts
    oa = float(area64.sum())
    print(json.dumps(dict(
        closure_rel=dict(temp=round(errs["temp"], 5),
                         salt=round(errs["salt"], 5)),
        d_heat_wm2=round(d_heat / seg_s / oa * 4.186e7 * 1e-3, 3),
        applied_wm2=round(applied / seg_s / oa * 4.186e7 * 1e-3, 3),
        bhf_wm2=round(bhf_int / seg_s / oa * 4.186e7 * 1e-3, 3),
        resid_wm2=round((d_heat - applied - bhf_int) / seg_s / oa
                        * 4.186e7 * 1e-3, 3),
    )), flush=True)

    # ---- fused segment from the same start -------------------------
    fused = m.run_segment(state)
    d_heat_fused = float(jnp.einsum(
        "kji,kji->", jnp.asarray(
            np.asarray(fused.ocean.t[0], np.float64) - before_t[0],
            jnp.float64), jnp.asarray(dvol, jnp.float64)))
    acc_f = m.last_acc
    ohf_f = float((np.asarray(acc_f["heat"], np.float64) * area64).sum()
                  ) * 2.389e-8 / float(acc_f["time"]) * seg_s
    print(json.dumps(dict(
        fused_d_heat_wm2=round(
            d_heat_fused / seg_s / oa * 4.186e7 * 1e-3, 3),
        fused_acc_heat_wm2=round(
            ohf_f / seg_s / oa * 4.186e7 * 1e-3, 3),
        manual_acc_heat_wm2=round(
            float((np.asarray(acc["heat"], np.float64) * area64).sum())
            * 2.389e-8 / float(acc["time"]) * 1e-3 * 4.186e7
            / oa, 3),
    )), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
