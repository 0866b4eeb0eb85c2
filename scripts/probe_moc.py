"""Probe the earth-config circulation: annual-mean MOC/psi structure,
velocity extrema locations, and the annual-mean TOA budget.

The per-segment diagnostics alias the seasonal cycle (a late-December
segment shows SH-summer TOA of +90 W/m2 at 60S); everything here is
accumulated over full years.

Usage: python scripts/probe_moc.py [years]
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import uvic_tpu

uvic_tpu.enable_compile_cache()


def main(years=2):
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
    latu = np.asarray(g.yu)
    area = (np.asarray(g.cst)[:, None] * np.asarray(g.dyt)[:, None]
            * np.asarray(g.dxt)[None, :])
    area[:, 0] = 0.0
    area[:, -1] = 0.0

    seg_per_year = int(round(365.0 / cfg.time.segtim_days))
    state = m.init_state()
    t0 = time.time()
    for yr in range(years):
        v_sum = None
        psi_sum = None
        acc_sum = {}
        for s in range(seg_per_year):
            state = m.run_segment(state)
            m.relyr += cfg.time.segtim_days / 365.0
            v = np.asarray(m.last_tavg["v"])
            psi = np.asarray(m.last_tavg["psi"])
            v_sum = v if v_sum is None else v_sum + v
            psi_sum = psi if psi_sum is None else psi_sum + psi
            for k in ("toa_sw", "olr", "heat", "time"):
                acc_sum[k] = acc_sum.get(k, 0.0) + np.asarray(
                    m.last_acc[k], dtype=np.float64)
        v_ann = v_sum / seg_per_year
        psi_ann = psi_sum / seg_per_year
        moc = np.asarray(meridional_overturning(
            jnp.asarray(v_ann), m.ocean.g, m.ocean.umask)) / 1e12
        toa2d = (acc_sum["toa_sw"] - acc_sum["olr"]) / acc_sum["time"] \
            * 1e-3
        toa_gm = float((toa2d * area).sum() / area.sum())
        zt_km = np.asarray(g.zt) / 1e5

        kmax, jmax = np.unravel_index(np.argmax(moc), moc.shape)
        kmin, jmin = np.unravel_index(np.argmin(moc), moc.shape)
        # annual-mean velocity extrema
        vab = np.abs(v_ann)
        kv, jv, iv = np.unravel_index(np.argmax(vab), vab.shape)
        # instantaneous too
        u_full = np.asarray(m.ocean.full_velocity(
            state.ocean.u, state.ocean.psi0))
        uab = np.abs(u_full)
        cu, ku, ju, iu = np.unravel_index(np.argmax(uab), uab.shape)
        psiab = np.abs(psi_ann)
        jp, ip = np.unravel_index(np.argmax(psiab), psiab.shape)

        def zonal_toa(lats):
            out = []
            for L in lats:
                j = int(np.argmin(np.abs(lat - L)))
                w = area[j]
                out.append(round(float((toa2d[j] * w).sum()
                                       / max(w.sum(), 1e-30)), 1))
            return out

        print(json.dumps(dict(
            yr=yr + 1,
            toa_gm_ann=round(toa_gm, 2),
            toa_z_ann=zonal_toa([-85, -60, -30, 0, 30, 60, 85]),
            moc_max=round(float(moc.max()), 1),
            moc_max_at=dict(z_km=round(zt_km[kmax], 2),
                            lat=round(latu[jmax], 1)),
            moc_min=round(float(moc.min()), 1),
            moc_min_at=dict(z_km=round(zt_km[kmin], 2),
                            lat=round(latu[jmin], 1)),
            vmax_cm_s=round(float(vab.max()), 1),
            vmax_at=dict(z_km=round(zt_km[kv], 2),
                         lat=round(latu[jv], 1), i=int(iv)),
            umax_inst=round(float(uab.max()), 1),
            umax_at=dict(c=int(cu), z_km=round(zt_km[ku], 2),
                         lat=round(latu[ju], 1), i=int(iu)),
            psi_max_sv=round(float(psiab.max()) / 1e12, 1),
            psi_max_at=dict(lat=round(latu[jp], 1), i=int(ip)),
            wall=round(time.time() - t0, 1),
        )), flush=True)
        # MOC zonal profile at depth for the final year
        if yr == years - 1:
            for L in [-60, -30, 0, 30, 50, 65]:
                j = int(np.argmin(np.abs(latu - L)))
                prof = [round(float(moc[k, j]), 1)
                        for k in range(0, g.km, 3)]
                print(json.dumps(dict(lat=L, moc_profile=prof)),
                      flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
