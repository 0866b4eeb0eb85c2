"""Triage the Earth full-physics non-finite blowup (STATUS known gap #1).

Runs the coupled earth config segment by segment, printing per-field
max-abs and first non-finite location to localize the instability.

Usage: python scripts/triage_earth.py [max_segments]
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import uvic_tpu

uvic_tpu.enable_compile_cache()

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")


def field_report(name, arr):
    a = np.asarray(arr)
    bad = ~np.isfinite(a)
    if bad.any():
        idx = np.argwhere(bad)[0]
        return f"{name}: NONFINITE at {tuple(int(i) for i in idx)} (n={bad.sum()})"
    return f"{name}: max|.|={np.abs(a).max():.4g}"


def main(max_segments=80):
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
    seg_days = cfg.time.segtim_days
    t0 = time.time()
    prev = state
    for s in range(max_segments):
        prev = state
        state = m.run_segment(state)
        m.relyr += seg_days / 365.0
        import jax
        leaves = jax.tree_util.tree_leaves_with_path(state)
        fields = {jax.tree_util.keystr(p): v for p, v in leaves
                  if hasattr(v, "shape")}
        reports = {k: field_report(k, v) for k, v in fields.items()}
        nonfin = [r for r in reports.values() if "NONFINITE" in r]
        tmax = float(np.abs(np.asarray(state.ocean.t[0])).max())
        uarr = np.asarray(m.ocean.full_velocity(state.ocean.u,
                                                state.ocean.psi0))
        umax = float(np.abs(uarr).max())
        c, k, j, i = np.unravel_index(np.abs(uarr).argmax(), uarr.shape)
        g = m.grid
        loc = (f"{'uv'[c]}k{k}({np.asarray(g.yu)[j]:.0f}N,"
               f"{np.asarray(g.xu)[i]:.0f}E)")
        print(f"seg {s:3d} day {(s+1)*seg_days:7.1f} "
              f"Tmax {tmax:9.4g} umax {umax:9.4g} @{loc:22s} "
              f"psi {float(np.abs(np.asarray(state.ocean.psi0)).max())/1e12:8.2f}Sv "
              f"atmax {float(np.abs(np.asarray(state.atm.at[0])).max()):8.4g} "
              f"wall {time.time()-t0:6.1f}s", flush=True)
        if nonfin:
            print("FIRST NON-FINITE SEGMENT", s)
            for k, r in reports.items():
                print("  ", r)
            prev_leaves = jax.tree_util.tree_leaves_with_path(prev)
            safe = lambda k: k.replace("[", "_").replace("]", "_") \
                .replace("'", "").replace(".", "_")
            np.savez("/tmp/earth_blowup.npz",
                     **{f"prev_{safe(jax.tree_util.keystr(p))}":
                        np.asarray(v) for p, v in prev_leaves
                        if hasattr(v, "shape")},
                     **{f"bad_{safe(k)}": np.asarray(v)
                        for k, v in fields.items()})
            print("saved /tmp/earth_blowup.npz")
            return
    print("stable for", max_segments, "segments")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 80)
