"""Per-segment ocean heat closure across full years of the fused
coupled earth run: find WHICH segments leak.

For every segment: d(ocean heat inventory) - applied(acc.heat) - bhf,
in W/m^2 over the ocean.  Inventory differencing is done host-side in
float64 from per-column partial sums (f32 state, f64 accumulation).

Usage: python scripts/probe_year_closure.py [years]
"""

import dataclasses
import json
import sys

sys.path.insert(0, ".")

import numpy as np

import uvic_tpu

uvic_tpu.enable_compile_cache()


def main(years=1):
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
    area64 = np.asarray(audit.ocean_area, np.float64)
    oa = float(area64.sum())
    dvol = jnp.asarray(audit.dvol)

    heat_cols = jax.jit(lambda t: jnp.sum(t[0] * dvol, axis=0))

    def heat_inv(t):
        return float(np.asarray(heat_cols(t), np.float64).sum())

    bhf_rate = 0.0
    if m.ocean.bhf is not None:
        bhf_rate = float((np.asarray(m.ocean.bhf, np.float64)
                          * area64).sum())   # cal/s ~ K cm^3/s

    seg_per_year = int(round(365.0 / cfg.time.segtim_days))
    seg_s = cfg.time.segtim_days * 86400.0
    state = m.init_state()
    H0 = heat_inv(state.ocean.t)
    worst = 0.0
    for yr in range(years):
        resids = []
        for s in range(seg_per_year):
            state = m.run_segment(state)
            m.relyr += cfg.time.segtim_days / 365.0
            H1 = heat_inv(state.ocean.t)
            acc = m.last_acc
            applied = float((np.asarray(acc["heat"], np.float64)
                             * area64).sum()) * 2.389e-8  # K cm^3
            resid = (H1 - H0 - applied - bhf_rate * seg_s)
            resid_wm2 = resid * 4.186e7 / seg_s / oa * 1e-3
            resids.append(resid_wm2)
            H0 = H1
        r = np.asarray(resids)
        iworst = int(np.abs(r).argmax())
        print(json.dumps(dict(
            yr=yr + 1,
            resid_mean_wm2=round(float(r.mean()), 3),
            resid_min=round(float(r.min()), 3),
            resid_max=round(float(r.max()), 3),
            worst_seg=iworst,
            worst=round(float(r[iworst]), 3),
        )), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
