"""Conservation audits (global_sums.F `globalsum` equivalents).

Global inventories of heat, salt, and freshwater computed on device;
drift between audits = bug (SURVEY.md §4.2). Called at run start,
per segment, and at run end by the driver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class ConservationAudit:
    def __init__(self, ocean_model):
        g = ocean_model.params.grid
        tmask = ocean_model.tmask
        dvol = (jnp.asarray(g.dzt)[:, None, None]
                * jnp.asarray(g.cst)[None, :, None]
                * jnp.asarray(g.dyt)[None, :, None]
                * jnp.asarray(g.dxt)[None, None, :]) * tmask
        # count each physical cell once (exclude duplicated columns)
        self.dvol = dvol.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
        self._inv = jax.jit(self._inventories)

    def _inventories(self, t):
        return dict(
            heat=jnp.sum(t[0] * self.dvol),      # [K cm^3]
            salt=jnp.sum(t[1] * self.dvol),      # [model-S cm^3]
        )

    def inventories(self, ocean_state) -> dict:
        return {k: float(v) for k, v in self._inv(ocean_state.t).items()}

    def drift(self, before: dict, after: dict) -> dict:
        out = {}
        for k in before:
            scale = abs(before[k]) + 1e-30
            out[k] = (after[k] - before[k]) / scale
        return out
