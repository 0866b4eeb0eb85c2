"""Prognostic state pytrees.

The reference keeps prognostic fields in COMMON-block slabs streamed
through a latitude memory window with disk pointer shuffles (mw.h,
loadmw.F, odam.F).  Here the state is a single immutable pytree of
whole-domain arrays; leapfrog time levels are explicit fields and a step
returns a new state (functional update — XLA buffer donation makes this
in-place on device).

Velocity fields hold the *internal mode only*; the external (barotropic)
mode is reconstructed from the streamfunction when needed
(loadmw.F:579-707 `add_ext_mode`).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class OceanState:
    # tracers [nt, km, jmt, imt] at tau-1 and tau
    tm1: jnp.ndarray
    t: jnp.ndarray
    # internal-mode velocity [2, km, jmt, imt] at tau-1 and tau
    um1: jnp.ndarray
    u: jnp.ndarray
    # streamfunction [jmt, imt] at tau (psi0) and tau-1 (psi1)
    # (emode.h psi(imt,jmt,1:2)); in the surface-pressure barotropic
    # modes these slots hold the surface pressure ps(tau)/ps(tau-1)
    psi0: jnp.ndarray
    psi1: jnp.ndarray
    # last two barotropic solutions, for the CG initial guess
    # (tropic.F:146-160 reads them from kflds records); in the
    # surface-pressure modes ptd holds pguess (emode.h:102)
    ptd: jnp.ndarray
    ptdb: jnp.ndarray
    # barotropic velocities [2, jmt, imt] at tau and tau-1 — prognostic
    # only in the surface-pressure modes (emode.h:105 ubar/ubarm1);
    # zeros in the streamfunction mode
    ubar: jnp.ndarray
    ubarm1: jnp.ndarray
    # step counter
    itt: jnp.ndarray
    # cumulative barotropic-solver non-convergence count (tropic.F
    # nconv; the run aborts when it exceeds 50)
    nconv: jnp.ndarray = None


def init_ocean_state(nt: int, km: int, jmt: int, imt: int, dtype,
                     t_init=None) -> OceanState:
    """Cold-start state (setmom.F idealized IC path)."""
    t0 = (jnp.zeros((nt, km, jmt, imt), dtype=dtype)
          if t_init is None else jnp.asarray(t_init, dtype=dtype))
    # distinct buffers per field: steps donate the state, and XLA rejects
    # donating one buffer twice
    return OceanState(
        tm1=t0 + 0.0, t=t0,
        um1=jnp.zeros((2, km, jmt, imt), dtype=dtype),
        u=jnp.zeros((2, km, jmt, imt), dtype=dtype),
        psi0=jnp.zeros((jmt, imt), dtype=dtype),
        psi1=jnp.zeros((jmt, imt), dtype=dtype),
        ptd=jnp.zeros((jmt, imt), dtype=dtype),
        ptdb=jnp.zeros((jmt, imt), dtype=dtype),
        ubar=jnp.zeros((2, jmt, imt), dtype=dtype),
        ubarm1=jnp.zeros((2, jmt, imt), dtype=dtype),
        itt=jnp.zeros((), dtype=jnp.int32),
        nconv=jnp.zeros((), dtype=jnp.int32),
    )
