"""Step-level NaN debugging harness (SURVEY §5.2 sanitizers).

The production Run already guards yearly inventories (NaN -> abort with
saved restart).  This module is the step-level instrument for WHEN a
run dies: ``nan_report`` walks any state pytree and names every
non-finite leaf with its first offending location; ``bisect_segment``
replays the CORE of one coupled segment phase by phase (atm/ice
substeps, gosbc forcing, ocean substeps) outside the fused program and
reports the first phase — and for the scanned phases the first
substep — that introduces a non-finite value.  Limits: the land and
sediment sub-models and the transient forcings (anthro, awind,
sulphate, land ice) are NOT replayed; a NaN born only in those paths
will not reproduce here — use ``nan_report`` on the dying state to see
which component is poisoned first.

Usage (host-side, not jitted):

    from uvic_tpu.debug import bisect_segment, nan_report
    print(nan_report(state))
    print(bisect_segment(model, state))
"""

from __future__ import annotations

import numpy as np


def nan_report(tree, prefix="state") -> list:
    """List of (path, n_nonfinite, first_index) for every non-finite
    leaf in the pytree."""
    import jax

    out = []
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        if not hasattr(leaf, "dtype"):
            continue
        a = np.asarray(leaf)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        bad = ~np.isfinite(a)
        n = int(bad.sum())
        if n:
            key = prefix + "/".join(
                str(getattr(p, "name", getattr(p, "idx", p)))
                for p in path)
            first = tuple(int(v) for v in
                          np.unravel_index(bad.argmax(), a.shape))
            out.append((key, n, first))
    return out


def _check(tag, tree, log):
    rep = nan_report(tree, prefix=tag + ":")
    if rep:
        log.append((tag, rep[:4]))
        return True
    return False


def bisect_segment(model, state, max_substeps=None) -> dict:
    """Replay one segment phase by phase; return the first phase that
    produces a non-finite value (or ok=True).  ``model`` is a
    CoupledModel; ``state`` the CoupledState entering the segment."""
    import jax
    import jax.numpy as jnp

    from .models.embm.insolation import daily_insolation

    # the jitted sub-steps donate their state argument; replay on a
    # private copy so the caller's state stays alive
    state = jax.tree_util.tree_map(
        lambda x: jnp.array(x) if hasattr(x, "dtype") else x, state)

    cfg = model.cfg
    log = []
    sst, sss, frzpt = model.gasbc(state)
    u_surf = model.ocean.full_velocity(state.ocean.u, state.ocean.psi0)
    uocn, vocn = u_surf[0, 0], u_surf[1, 0]
    if cfg.embm.seasonal:
        yrlen = 360.0 if cfg.time.eqyear else 365.0
        day = (model.relyr % 1.0) * yrlen + 0.5 * cfg.time.segtim_days
        solins = daily_insolation(model.tlat_rad2d, day, yrlen)
    else:
        solins = model.embm.solins
    land_gc = None
    if state.land is not None and state.land.gc is not None:
        land_gc = state.land.gc * 100.0

    atm, ice = state.atm, state.ice
    acc = None
    nsub = model.ntspas if max_substeps is None \
        else min(model.ntspas, max_substeps)
    for s in range(nsub):
        mixing = bool(atm.nats + 1 > cfg.embm.namix)
        atm, ice, a, _ = model._atm_ice_step(
            atm, ice, sst, frzpt, uocn, vocn,
            jnp.asarray(0.0, sst.dtype), None, solins, None, land_gc,
            None, None, mixing=mixing)
        acc = a if acc is None else {k: acc[k] + a[k] for k in acc}
        if _check(f"atm_ice[{s}]", (atm, ice), log):
            return dict(ok=False, phase=f"atm_ice substep {s}",
                        detail=log)

    st2 = state.replace(atm=atm, ice=ice)
    swr_mean = acc["swr"] / acc["time"]
    forcing = model.gosbc(acc, st2, sst, sss, swr_mean,
                          relyr=model.relyr)
    if _check("gosbc_forcing", (forcing.stf, forcing.smf), log):
        return dict(ok=False, phase="gosbc forcing", detail=log)

    ocean = state.ocean
    for s in range(model.ntspos):
        lf = bool(np.asarray(ocean.itt) % cfg.ocean.nmix != 0)
        ocean = model.ocean.step(ocean, forcing, leapfrog=lf)
        if _check(f"ocean[{s}]", (ocean.t, ocean.u, ocean.psi0), log):
            return dict(ok=False, phase=f"ocean substep {s}",
                        detail=log)
    return dict(ok=True, phase=None, detail=[])
