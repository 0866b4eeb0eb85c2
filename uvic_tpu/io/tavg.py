"""Time-averaged field output (tavg).

TPU-native re-design of the ta_* accumulator system (mom_tavg.F,
timeavgs.h, ice.h:72-107): device-side running sums of selected fields,
normalized and written at `timavgint` intervals.  The accumulator is a
dict pytree so adding fields is declarative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class TavgAccumulator:
    """Accumulates snapshots; normalize() returns time means."""

    def __init__(self):
        self.sums = None
        self.n = 0
        self._add = jax.jit(lambda sums, fields: jax.tree_util.tree_map(
            jnp.add, sums, fields))

    def accumulate(self, fields: dict):
        if self.sums is None:
            self.sums = jax.tree_util.tree_map(lambda a: a + 0.0, fields)
        else:
            self.sums = self._add(self.sums, fields)
        self.n += 1

    def normalize(self) -> dict:
        if self.n == 0:
            return {}
        out = {k: np.asarray(v) / self.n for k, v in self.sums.items()}
        self.sums = None
        self.n = 0
        return out


def ocean_tavg_fields(ocean_model, ocean_state) -> dict:
    """The standard averaged field set (mom_tavg.F selection)."""
    u = ocean_model.full_velocity(ocean_state.u, ocean_state.psi0)
    return dict(
        temp=ocean_state.t[0],
        salt=ocean_state.t[1] * 1000.0 + 35.0,
        u=u[0], v=u[1],
        psi=ocean_state.psi0,
    )


def coupled_tavg_fields(model, state) -> dict:
    out = ocean_tavg_fields(model.ocean, state.ocean)
    out.update(dict(
        sat=state.atm.at[0],
        shum=state.atm.at[1],
        hice=state.ice.hice,
        aice=state.ice.aice,
        hsno=state.ice.hsno,
    ))
    return out
