"""Benchmark: ocean tracer-step throughput on the standard UVic grid.

Runs the flagship ocean dynamical core (3.6x1.8 deg, 19 levels, FCT
advection, full convection, island-constrained CG barotropic solve) on
the available accelerator and reports grid-points/s (ocean cell-tracer
updates per second) plus model-years/day.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against a MEASURED single-core CPU baseline:
golden/c_baseline/tracer_baseline.c, a C implementation of the
reference's per-step work (EOS + FCT tracer update + invtri + convect +
clinic + barotropic CG) with the reference's loop structure, compiled
gcc -O3 -march=native and timed on this machine (the image has no
Fortran compiler, so the reference Fortran itself cannot be built —
BASELINE.md documents the methodology).  Best-of-3 on one Xeon
2.10 GHz core, 2026-08: nt=2 -> 1.44e7, nt=39 -> 4.03e7
cell-tracer-updates/s.  The nt=39 figure is the denominator for the
MOBI headline (generous to the reference: best observed run).
"""

import json
import sys
import time

import numpy as np

BASELINE_C_GPS = {2: 1.44e7, 39: 4.03e7}  # measured, see module docstring


def _baseline_gps(nt):
    """Interpolate the measured single-core baseline to this nt (fixed
    per-step costs amortize over tracers, so gps grows with nt)."""
    lo_nt, hi_nt = 2, 39
    lo, hi = BASELINE_C_GPS[lo_nt], BASELINE_C_GPS[hi_nt]
    if nt <= lo_nt:
        return lo
    if nt >= hi_nt:
        return hi
    w = (nt - lo_nt) / (hi_nt - lo_nt)
    return lo + w * (hi - lo)


def _enable_compile_cache():
    """Persistent XLA compilation cache: the fused Pallas CG costs
    ~150 s to compile via the TPU tunnel; cache it across processes."""
    import os

    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def _time_config(nsteps, dtype, mobi=False):
    import jax
    import __graft_entry__ as ge

    m, state, forcing = ge._flagship(small=False, dtype=dtype, mobi=mobi)
    state = m.run_scan(state, forcing, nsteps)   # compile + warmup
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state = m.run_scan(state, forcing, nsteps)
    jax.block_until_ready(state)
    dt_wall = (time.perf_counter() - t0) / nsteps
    assert not bool(jax.numpy.isnan(state.t).any()), "bench produced NaN"
    ocean_cells = int(np.asarray(m.params.topo.tmask).sum())
    return m, ocean_cells * m.nt / dt_wall, dt_wall


def main(nsteps=20, dtype="float32"):
    import jax

    _enable_compile_cache()

    m, gps, dt_wall = _time_config(nsteps, dtype, mobi=False)
    myd = m.cfg.ocean.dtts / dt_wall / 365.0
    extras = {"physics_nt": m.nt,
              "physics_gridpoints_s": round(gps, 1),
              "physics_step_wall_s": round(dt_wall, 5),
              "model_years_per_day": round(myd, 1)}
    # headline: the reference's configured model is the FULL MOBI
    # biogeochemistry suite (run/mk.in Model_Options), ~39 tracers
    try:
        m2, gps_mobi, dt_mobi = _time_config(max(nsteps // 2, 5), dtype,
                                             mobi=True)
        head_gps, head_nt = gps_mobi, m2.nt
        extras["mobi_step_wall_s"] = round(dt_mobi, 5)
    except Exception as e:  # fall back to the physics-only number
        head_gps, head_nt = gps, m.nt
        extras["mobi_error"] = str(e)[:120]

    print(json.dumps({
        "metric": "ocean tracer-step grid-points/s (std 3.6x1.8x19 grid, "
                  f"full MOBI nt={head_nt}, {jax.devices()[0].platform})",
        "value": round(head_gps, 1),
        "unit": "cell-tracer-updates/s",
        "vs_baseline": round(head_gps / _baseline_gps(head_nt), 3),
        "baseline_gps_measured_c": _baseline_gps(head_nt),
        **extras,
    }))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    main(n)
