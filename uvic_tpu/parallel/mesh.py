"""Spatial domain decomposition over a TPU device mesh.

The reference is a serial program; its only "decomposition" is the
latitude memory window (SURVEY.md §2.9, §5.7).  Here the whole state is
SPMD-sharded over a 2-D ``(y, x)`` device mesh with `jax.sharding`:
every field carries a NamedSharding that splits the (jmt, imt) trailing
dimensions, the step function is jitted with those shardings as
input/output constraints, and XLA inserts the halo exchanges (the
stencil shifts become collective-permutes over ICI) and the psum
reductions for the CG dot products and island segment sums.

This works identically on 1 device (no-op), one host with N chips, and
multi-host meshes (DCN) — and on the virtual CPU mesh used in tests.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=(1, 1), axis_names=("y", "x"), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, axis_names)


def spec_for(ndim: int, mesh: Mesh) -> P:
    """PartitionSpec splitting the trailing (jmt, imt) axes over (y, x)."""
    y, x = mesh.axis_names
    if ndim < 2:
        return P()
    return P(*([None] * (ndim - 2) + [y, x]))


def shard_pytree(tree: Any, mesh: Mesh) -> Any:
    """Place every array in the pytree with its spatial sharding.
    Axes the mesh does not divide evenly stay unsharded (device_put
    rejects uneven shards; the explicit-halo path pads them itself)."""
    y, x = mesh.axis_names
    ny, nx = mesh.devices.shape

    def place(a):
        if not hasattr(a, "ndim") or a.ndim < 2:
            return a
        sy = y if a.shape[-2] % ny == 0 else None
        sx = x if a.shape[-1] % nx == 0 else None
        spec = P(*([None] * (a.ndim - 2) + [sy, sx]))
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, tree)


def sharding_tree(tree: Any, mesh: Mesh) -> Any:
    """Matching tree of NamedShardings (scalars -> replicated)."""
    def spec(a):
        ndim = getattr(a, "ndim", 0)
        return NamedSharding(mesh, spec_for(ndim, mesh))
    return jax.tree_util.tree_map(spec, tree)


def shard_step(step_fn, mesh: Mesh, state_example, forcing_example):
    """Jit a (state, forcing) -> state step with spatial input/output
    sharding constraints over the mesh."""
    in_shardings = (sharding_tree(state_example, mesh),
                    sharding_tree(forcing_example, mesh))
    out_shardings = sharding_tree(state_example, mesh)
    return jax.jit(step_fn, in_shardings=in_shardings,
                   out_shardings=out_shardings, donate_argnums=(0,))
