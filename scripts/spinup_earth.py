"""Long coupled spinup of the earth configuration.

Runs N model years, logging ANNUAL-mean climate diagnostics (the
per-segment numbers alias the seasonal cycle) to a JSONL file and
checkpointing the full coupled state every ``save_every`` years so runs
can resume (io/restart).

The reference's spinup is the model's core use case
(source/common/UVic_ESCM.F:296-416 segment loop over decades);
``--accel`` enables the accel.h deep tracer acceleration for faster
deep-ocean equilibration (Bryan 1984 asynchronous stepping).

Usage:
  python scripts/spinup_earth.py YEARS [--accel F] [--out DIR]
                                 [--resume] [--log FILE]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import uvic_tpu

uvic_tpu.enable_compile_cache()


def _psi_loc(psi_ann, m):
    """(lat, lon) of the |psi| maximum — separates the ACC from the
    transient SO deep-convection barotropic vortices."""
    p = np.abs(np.asarray(psi_ann))
    jj, ii = np.unravel_index(p.argmax(), p.shape)
    return [round(float(np.asarray(m.grid.yu)[jj]), 1),
            round(float(np.asarray(m.grid.xu)[ii]) % 360.0, 1)]


def _drake_transport(psi_ann, m):
    """ACC transport [Sv]: psi range along a meridional section through
    Drake Passage (the observable the ~130-170 Sv estimates measure,
    unlike the global |psi| max which tracks transient convection
    vortices)."""
    yu = np.asarray(m.grid.yu)
    xu = np.asarray(m.grid.xu) % 360.0
    i = int(np.argmin(np.abs(xu - 292.0)))
    jsel = (yu > -66.0) & (yu < -54.0)
    sec = np.asarray(psi_ann)[jsel, i]
    return round(float(sec.max() - sec.min()) / 1e12, 1)


def yearly_diags(m, state, acc_sum, v_ann, psi_ann, ice_samples, area,
                 oarea, lat, vgm_ann=None, amask=None):
    import jax.numpy as jnp
    from uvic_tpu.diag.energy import gm_overturning, meridional_overturning

    sst = np.asarray(state.ocean.t[0, 0])
    sat = np.asarray(state.atm.at[0])
    tsec = acc_sum["time"]
    toa2d = (acc_sum["toa_sw"] - acc_sum["olr"]) / tsec * 1e-3
    heat2d = acc_sum["heat"] / tsec * 1e-3
    moc = np.asarray(meridional_overturning(
        jnp.asarray(v_ann, state.ocean.t.dtype), m.ocean.g,
        m.ocean.umask), np.float64) / 1e12
    moc_res = amoc = None
    if vgm_ann is not None:
        # residual (Eulerian + GM bolus) overturning — the physically
        # meaningful circulation (diago.F O_gm_diag; VERDICT r4 #4)
        dt_ = state.ocean.t.dtype
        psi_gm = np.asarray(gm_overturning(
            jnp.asarray(vgm_ann, dt_), m.ocean.g), np.float64) / 1e12
        moc_res = moc + psi_gm
        if amask is not None:
            moc_a = np.asarray(meridional_overturning(
                jnp.asarray(v_ann, dt_), m.ocean.g,
                m.ocean.umask * jnp.asarray(amask, dt_)[None]),
                np.float64) / 1e12
            moc_a += np.asarray(gm_overturning(
                jnp.asarray(vgm_ann, dt_), m.ocean.g,
                xmask2d=jnp.asarray(amask, dt_)), np.float64) / 1e12
            # AMOC headline: residual Atlantic deep cell max north of
            # 30S below 500 m
            zt = np.asarray(m.grid.zt)
            deep = zt >= 500.0e2
            jn_ = np.asarray(m.grid.yu) > -30.0
            amoc = float(moc_a[np.ix_(deep, jn_)].max())
    # the Eulerian zonal-mean MOC at the equator is dominated by the
    # surface Ekman rolls (+-90 Sv at +-1.8 deg, 30 m depth — standard
    # z-model artifact); the physical overturning headline masks
    # |lat| <= 5 like the usual practice
    yu = np.asarray(m.grid.yu)
    exeq = np.abs(yu) > 5.0
    moc_x = moc[:, exeq]
    ice_nh = np.asarray([s[0] for s in ice_samples])
    ice_sh = np.asarray([s[1] for s in ice_samples])

    def zavg(f, lats):
        out = []
        for L in lats:
            j = int(np.argmin(np.abs(lat - L)))
            w = area[j]
            out.append(round(float((f[j] * w).sum()
                                   / max(w.sum(), 1e-30)), 1))
        return out

    extra = {}
    if moc_res is not None:
        yu = np.asarray(m.grid.yu)
        zt_m = np.asarray(m.grid.zt) / 1e2
        exq = np.abs(yu) > 5.0
        mr = moc_res[:, exq]
        jmap = np.where(exq)[0]

        def loc(flat_arg):
            kk, jj = np.unravel_index(flat_arg, mr.shape)
            return [round(float(yu[jmap[jj]]), 1),
                    round(float(zt_m[kk]), 0)]

        extra = dict(moc_res_max=round(float(mr.max()), 1),
                     moc_res_min=round(float(mr.min()), 1),
                     # (lat_deg, depth_m) of the extrema: separates the
                     # gyre-boundary shallow cells and the SO deep-
                     # convection cell from genuine interior anomalies
                     moc_res_max_loc=loc(mr.argmax()),
                     moc_res_min_loc=loc(mr.argmin()))
        if amoc is not None:
            extra["amoc_sv"] = round(amoc, 1)
    return dict(
        **extra,
        sat_gm=round(float((sat * area).sum() / area.sum()), 3),
        sst_gm=round(float((sst * oarea).sum() / oarea.sum()), 3),
        toa_gm=round(float((toa2d * area).sum() / area.sum()), 3),
        ohf_gm=round(float((heat2d * oarea).sum() / oarea.sum()), 3),
        ice_nh_min=round(float(ice_nh.min()), 2),
        ice_nh_max=round(float(ice_nh.max()), 2),
        ice_sh_min=round(float(ice_sh.min()), 2),
        ice_sh_max=round(float(ice_sh.max()), 2),
        psi_max=round(float(np.abs(psi_ann).max()) / 1e12, 1),
        psi_max_loc=_psi_loc(psi_ann, m),
        acc_drake_sv=_drake_transport(psi_ann, m),
        moc_max=round(float(moc.max()), 1),
        moc_min=round(float(moc.min()), 1),
        moc_max_exeq=round(float(moc_x.max()), 1),
        moc_min_exeq=round(float(moc_x.min()), 1),
        toa_z=zavg(toa2d, [-85, -60, -30, 0, 30, 60, 85]),
        sat_z=zavg(sat, [-85, -60, -30, 0, 30, 60, 85]),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("years", type=int)
    p.add_argument("--accel", type=float, default=1.0)
    p.add_argument("--out", default="earth_spinup")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--log", default=None)
    p.add_argument("--save-every", type=int, default=10)
    p.add_argument("--run-id", default=None,
                   help="branch tag written to every log row "
                        "(default: PID+start time); the earth_run.json "
                        "builder refuses windows that mix run ids")
    args = p.parse_args()
    run_id = args.run_id or "r%d-%d" % (os.getpid(), int(time.time()))

    import jax.numpy as jnp
    from uvic_tpu.config import earth_config
    from uvic_tpu.coupler.driver import CoupledModel
    from uvic_tpu.diag.conservation import FullAudit
    from uvic_tpu.io.restart import load_restart, save_restart

    os.makedirs(args.out, exist_ok=True)
    logpath = args.log or os.path.join(args.out, "spinup_log.jsonl")
    cfg = earth_config(accel=args.accel)
    m = CoupledModel(cfg, topo_kind="earth")
    g = m.grid
    lat = np.asarray(g.yt)
    area = (np.asarray(g.cst)[:, None] * np.asarray(g.dyt)[:, None]
            * np.asarray(g.dxt)[None, :])
    area[:, 0] = 0.0
    area[:, -1] = 0.0
    tmsk = np.asarray(m.embm.tmsk)
    oarea = area * tmsk
    nh = (lat > 0)[:, None] * oarea
    sh = (lat < 0)[:, None] * oarea

    state = m.init_state()
    year0 = 0
    ckpt = os.path.join(args.out, "restart.npz")
    meta = os.path.join(args.out, "restart_meta.json")
    if args.resume and os.path.exists(ckpt):
        state = load_restart(ckpt, state)
        with open(meta) as f:
            md = json.load(f)
        year0 = md["year"]
        m.relyr = md["relyr"]
        print(f"resumed at year {year0}", flush=True)

    # ADVICE r4: derive the year length from the configured
    # calendar so restarts move cleanly between drivers (the
    # coupled Run/CoupledModel.run advance relyr at days/360
    # under the default eqyear calendar)
    yrlen = 360.0 if cfg.time.eqyear else 365.0
    seg_per_year = int(round(yrlen / cfg.time.segtim_days))
    t0 = time.time()

    # TOA <-> reservoir reconciliation (VERDICT r4 #2): every year,
    # compare the (asw - olr) diagnostic against d(atm+ocean+ice
    # latent)/dt from the FullAudit inventories.  They must agree to
    # ~0.1 W/m^2 (the residual is the land-snow branch); a growing
    # residual means an energy leak, not "deep ocean filling".
    audit = FullAudit(m)
    earth_area = float(np.asarray(audit.area, np.float64).sum())
    FLICE = 3.34e9

    def total_E(state):
        inv = audit.inventories(state)
        return (inv["atm_heat_J"] + inv["ocn_heat_J"]
                - FLICE * 1e-4 * inv["ice_water_kg"])    # J

    yr_s = yrlen * 86400.0
    E_prev = total_E(state)
    from uvic_tpu.core.earth import atlantic_mask
    amask = atlantic_mask(g)
    for yr in range(year0, year0 + args.years):
        acc_sum = {}
        v_sum = psi_sum = vgm_sum = None
        ice_samples = []
        for s in range(seg_per_year):
            state = m.run_segment(state)
            m.relyr += cfg.time.segtim_days / yrlen
            for k in ("toa_sw", "olr", "heat", "time"):
                acc_sum[k] = acc_sum.get(k, 0.0) + np.asarray(
                    m.last_acc[k], np.float64)
            v = np.asarray(m.last_tavg["v"], np.float64)
            psi = np.asarray(m.last_tavg["psi"], np.float64)
            v_sum = v if v_sum is None else v_sum + v
            psi_sum = psi if psi_sum is None else psi_sum + psi
            if "vntiso" in m.last_tavg:
                vgm = np.asarray(m.last_tavg["vntiso"], np.float64)
                vgm_sum = vgm if vgm_sum is None else vgm_sum + vgm
            if s % 6 == 0:
                aice = np.asarray(state.ice.aice)
                ice_samples.append(((aice * nh).sum() / 1e16,
                                    (aice * sh).sum() / 1e16))
        d = yearly_diags(m, state, acc_sum, v_sum / seg_per_year,
                         psi_sum / seg_per_year, ice_samples, area,
                         oarea, lat,
                         vgm_ann=(None if vgm_sum is None
                                  else vgm_sum / seg_per_year),
                         amask=amask)
        d["year"] = yr + 1
        d["wall_s"] = round(time.time() - t0, 1)
        d["run_id"] = run_id
        d["accel"] = args.accel
        E_now = total_E(state)
        d["dE_wm2"] = round((E_now - E_prev) / yr_s / earth_area
                            * 1e4, 3)
        d["toa_audit_resid_wm2"] = round(d["toa_gm"] - d["dE_wm2"], 3)
        E_prev = E_now
        if not np.isfinite(d["sat_gm"]):
            raise SystemExit("non-finite state at year %d" % (yr + 1))
        with open(logpath, "a") as f:
            f.write(json.dumps(d) + "\n")
        print(json.dumps(d), flush=True)
        if (yr + 1 - year0) % args.save_every == 0 \
                or yr + 1 == year0 + args.years:
            save_restart(ckpt, state)
            with open(meta, "w") as f:
                json.dump(dict(year=yr + 1, relyr=m.relyr,
                               accel=args.accel), f)


if __name__ == "__main__":
    main()
