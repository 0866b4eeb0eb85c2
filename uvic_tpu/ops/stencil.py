"""Stencil shift helpers and boundary conditions.

The reference expresses stencils with Fortran statement functions over a
latitude memory window (fdift.h/fdifm.h) and applies the zonal cyclic
condition with ``setbcx`` (util.F:789-815).  Here fields are whole-domain
arrays ``(..., jmt, imt)`` and stencils are composed from shift operators;
XLA fuses the resulting elementwise graphs into a handful of kernels.

Index conventions (0-based):
- ``E(a)[..., j, i] == a[..., j, i+1]`` (east neighbor), cyclic in x,
- ``N(a)[..., j, i] == a[..., j+1, i]``; the meridional boundary rows are
  solid walls, so the wrapped rows 0/jmt-1 must be masked by callers (all
  reference stencils multiply by tmask/umask which are 0 there),
- ``DN(a)[..., k, j, i] == a[..., k+1, j, i]`` (level below), zero-padded
  beyond the bottom; ``UP`` the level above.
"""

from __future__ import annotations

import jax.numpy as jnp


def E(a):
    return jnp.roll(a, -1, axis=-1)


def W(a):
    return jnp.roll(a, 1, axis=-1)


def N(a):
    return jnp.roll(a, -1, axis=-2)


def S(a):
    return jnp.roll(a, 1, axis=-2)


def DN(a, fill=0.0):
    """Shift in k so index k holds level k+1; bottom filled with ``fill``."""
    pad = jnp.full_like(a[..., -1:, :, :], fill)
    return jnp.concatenate([a[..., 1:, :, :], pad], axis=-3)


def UP(a, fill=0.0):
    """Shift in k so index k holds level k-1; top filled with ``fill``."""
    pad = jnp.full_like(a[..., :1, :, :], fill)
    return jnp.concatenate([pad, a[..., :-1, :, :]], axis=-3)


def setbcx(a, cyclic: bool = True):
    """Zonal boundary condition on the duplicated boundary columns
    (util.F:789-815): cyclic wrap col 0 <- col imt-2, col imt-1 <- col 1;
    solid walls zero the boundary columns otherwise."""
    if cyclic:
        return a.at[..., 0].set(a[..., -2]).at[..., -1].set(a[..., 1])
    return a.at[..., 0].set(0.0).at[..., -1].set(0.0)


def zero_boundary_rows(a):
    """Zero the meridional boundary rows j=0 and j=jmt-1."""
    return a.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)


def interior_mask(jmt: int, imt: int, dtype):
    """1 on computed cells (j in 1..jmt-2, i in 1..imt-2), else 0."""
    m = jnp.zeros((jmt, imt), dtype=dtype)
    return m.at[1:-1, 1:-1].set(1.0)
