"""Checkpoint / restart.

TPU-native re-design of the reference restart system (mom_rest.F,
embm_rest.F, ... ; SURVEY.md §3.5): the restart carries BOTH leapfrog
time levels of every prognostic field so a split run reproduces a
continuous run exactly.  The whole coupled state pytree is serialized —
fields are discovered generically, so new components (bgc tracers, land,
sediments) are covered automatically.

Formats: compressed .npz (exact, default).  NetCDF export for
interoperability lives in uvic_tpu.io.netcdf.
"""

from __future__ import annotations

import warnings
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_state(state: Any, prefix: str = "") -> dict:
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_restart(path: str, state: Any, time_manager=None):
    """Write a restart file containing every leaf of the state pytree
    plus calendar information."""
    arrays = _flatten_state(state)
    meta = {}
    if time_manager is not None:
        meta["__itt"] = np.asarray(time_manager.itt)
        meta["__days"] = np.asarray(time_manager.days)
    np.savez_compressed(path, **arrays, **meta)


def load_restart(path: str, template: Any, time_manager=None):
    """Read a restart into a state shaped like ``template`` (exact
    round-trip: values restore bit-for-bit in the stored precision)."""
    with np.load(path) as data:
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = []
        missing = []
        for pth, leaf in leaves:
            key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                           for p in pth)
            if key in data:
                arr = data[key]
                new_leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
            else:
                # forward compatibility: a restart written before a
                # state field existed keeps the template's initial
                # value (the reference reads old restarts the same
                # way — new prognostics spin up from their ICs)
                new_leaves.append(leaf)
                missing.append(key)
        if missing:
            # ADVICE r4: a renamed field or truncated restart must not
            # silently cold-start prognostics
            warnings.warn(
                f"restart {path}: {len(missing)} state field(s) absent, "
                f"keeping template values: {', '.join(missing[:8])}"
                + (" ..." if len(missing) > 8 else ""),
                stacklevel=2)
        state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), new_leaves)
        if time_manager is not None and "__itt" in data:
            time_manager.itt = int(data["__itt"])
            time_manager.days = float(data["__days"])
    return state
