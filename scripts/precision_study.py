"""f32-vs-f64 drift study (SURVEY 7.4-2, VERDICT round-1 item 7).

Runs the same ocean configuration in float64 and float32 on CPU for N
steps and reports per-subsystem drift: tracers (T/S), baroclinic
velocity, barotropic streamfunction, and — with MOBI on — the bgc
tracer envelope.  The goal is to locate where f32 breaks the solution
(the elliptic solve and the pressure-gradient/EOS path are the usual
suspects) and quantify the error growth rate that the TPU f32 bench
configuration carries.

Usage: python scripts/precision_study.py [nsteps] [--mobi]
"""

import os, sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys

os.environ.setdefault("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses
import json

import numpy as np
import jax.numpy as jnp


def build(dtype, mobi, nj=34, ni=40, km=8):
    from uvic_tpu.config import mobi_full, small_config
    from uvic_tpu.models.ocean.model import make_forcing, make_ocean
    cfg = small_config(imt=ni, jmt=nj, km=km)
    cfg = cfg.replace(dtype=dtype, ocean=dataclasses.replace(
        cfg.ocean, isopycmix=True, gent_mcwilliams=True,
        dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e2,
        mxscan=2000))
    if mobi:
        cfg = cfg.replace(bgc=mobi_full())
    m = make_ocean(cfg)
    g = m.params.grid
    t0 = np.zeros((m.nt, g.km, g.jmt, g.imt))
    vals = np.array([t.init for t in m.tracer_index.tracers])
    t0[:] = vals[:, None, None, None]
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m.params.topo.tmask)[None]
    yu = np.asarray(g.yu)
    taux = np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    smf = np.stack([taux / 1.035, np.zeros_like(taux)]).astype(dtype)
    stf = np.zeros((m.nt, g.jmt, g.imt), dtype)
    f = make_forcing(jnp.asarray(smf), jnp.asarray(stf))
    return m, m.init_state(t0.astype(dtype)), f


def run(dtype, nsteps, mobi):
    m, s, f = build(dtype, mobi)
    s = m.step(s, f, leapfrog=False)
    snaps = {}
    for n in range(nsteps):
        s = m.step(s, f, leapfrog=True)
        if (n + 1) in (nsteps // 4, nsteps // 2, nsteps):
            snaps[n + 1] = dict(
                t=np.asarray(s.t, np.float64),
                u=np.asarray(s.u, np.float64),
                psi=np.asarray(s.psi0, np.float64))
    return m, snaps


def main():
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    mobi = "--mobi" in sys.argv
    m64, snap64 = run("float64", nsteps, mobi)
    m32, snap32 = run("float32", nsteps, mobi)
    wet = np.asarray(m64.params.topo.tmask) > 0
    idx = m64.tracer_index
    out = {"nsteps": nsteps, "mobi": mobi, "rows": []}
    for n in sorted(snap64):
        a, b = snap64[n], snap32[n]
        dt_ = np.abs(a["t"] - b["t"])
        scale_T = max(np.abs(a["t"][0][wet]).max(), 1e-12)
        du = np.abs(a["u"] - b["u"]).max()
        uscale = max(np.abs(a["u"]).max(), 1e-12)
        dpsi = np.abs(a["psi"] - b["psi"])
        psis = max(np.abs(a["psi"]).std(), 1e-12)
        row = dict(
            step=int(n),
            temp_max_err=float(dt_[0][wet].max()),
            temp_rel=float(dt_[0][wet].max() / scale_T),
            salt_max_err=float(dt_[1][wet].max()),
            u_rel=float(du / uscale),
            psi_rel=float(dpsi.max() / psis),
        )
        if mobi and "dic" in idx:
            for nme in ("dic", "o2", "po4", "no3"):
                if nme in idx:
                    k = idx[nme]
                    sc = max(np.abs(a["t"][k][wet]).max(), 1e-12)
                    row[nme + "_rel"] = float(
                        dt_[k][wet].max() / sc)
        out["rows"].append(row)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
