"""Bitwise-ish comparison: fused run_segment vs manual replication of
the same segment from the same initial state.

Usage: python scripts/probe_fused_vs_manual.py [spinup_segments]
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

    cfg = ModelConfig().replace(dtype="float32")
    cfg = cfg.replace(
        ocean=dataclasses.replace(
            cfg.ocean, isopycmix=True, gent_mcwilliams=True,
            tidal_kv=True, gthflx=True, aniso_visc=True,
            aniso_zonal=True),
        embm=dataclasses.replace(cfg.embm, seasonal=True),
        land=dataclasses.replace(cfg.land, enabled=True))
    m = CoupledModel(cfg, topo_kind="earth")
    state = m.init_state()
    for _ in range(spinup):
        state = m.run_segment(state)
        m.relyr += cfg.time.segtim_days / 365.0

    copy = jax.tree_util.tree_map(
        lambda x: jnp.array(x) if hasattr(x, "dtype") else x, state)

    # ---- fused -----------------------------------------------------
    fused = m.run_segment(state)
    acc_f = {k: np.asarray(v, np.float64) for k, v in m.last_acc.items()}

    # ---- manual (same semantics as _segment_core) ------------------
    state = copy
    sst, sss, frzpt = m.gasbc(state)
    u_surf = m.ocean.full_velocity(state.ocean.u, state.ocean.psi0)
    uocn, vocn = u_surf[0, 0], u_surf[1, 0]
    from uvic_tpu.models.embm.insolation import daily_insolation
    day = (m.relyr % 1.0) * 365.0 + 0.5 * cfg.time.segtim_days
    solins = daily_insolation(m.tlat_rad2d, day, 365.0)
    land_gc = None
    if state.land is not None and state.land.gc is not None:
        land_gc = state.land.gc * 100.0

    atm, ice = state.atm, state.ice
    acc = None
    for _ in range(m.ntspas):
        mixing = bool(atm.nats + 1 > cfg.embm.namix)
        atm, ice, a, _ = m._atm_ice_step(
            atm, ice, sst, frzpt, uocn, vocn,
            jnp.asarray(0.0, sst.dtype), None, solins, None, land_gc,
            None, None, mixing=mixing)
        acc = a if acc is None else {k: acc[k] + a[k] for k in acc}

    swr_mean = acc["swr"] / acc["time"]
    st2 = state.replace(atm=atm, ice=ice)
    forcing = m.gosbc(acc, st2, sst, sss, swr_mean, relyr=m.relyr)
    ocean = state.ocean
    for _ in range(m.ntspos):
        lf = bool(np.asarray(ocean.itt) % cfg.ocean.nmix != 0)
        ocean = m.ocean.step(ocean, forcing, leapfrog=lf)

    d_sst = np.abs(np.asarray(fused.ocean.t[0]) - np.asarray(ocean.t[0]))
    d_acc = {k: float(np.abs(acc_f[k]
                             - np.asarray(acc[k], np.float64)).max())
             for k in ("heat", "freshwater", "swr")}
    print(json.dumps(dict(
        max_dT=float(d_sst.max()),
        mean_dT=float(d_sst.mean()),
        acc_absdiff=d_acc,
        acc_heat_scale=float(np.abs(acc_f["heat"]).max()),
    )), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
