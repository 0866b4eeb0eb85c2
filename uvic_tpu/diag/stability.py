"""Numerical stability monitors (stab.F equivalents, O_stability_tests).

Per-cell CFL / diffusion numbers with worst-offender reporting, run on
demand from the driver (SURVEY.md §4.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class StabilityMonitor:
    def __init__(self, ocean_model):
        self.m = ocean_model
        g = ocean_model.params.grid
        self.dx = (jnp.asarray(g.cst)[:, None]
                   * jnp.asarray(g.dxt)[None, :])       # (jmt, imt)
        self.dy = jnp.asarray(g.dyt)[:, None]
        self.dz = jnp.asarray(g.dzt)
        self._check = jax.jit(self._check_impl)

    def _check_impl(self, ocean_state, dtuv, dtts):
        m = self.m
        u = m.full_velocity(ocean_state.u, ocean_state.psi0)
        cfl_x = jnp.abs(u[0]) * dtuv / self.dx[None]
        cfl_y = jnp.abs(u[1]) * dtuv / self.dy[None]
        diff_x = m.cfg.ocean.am * dtuv / self.dx[None] ** 2
        return dict(
            cfl_x_max=jnp.max(cfl_x),
            cfl_y_max=jnp.max(cfl_y),
            diff_x_max=jnp.max(diff_x),
            umax=jnp.max(jnp.abs(u)),
        )

    def check(self, ocean_state) -> dict:
        out = self._check(ocean_state, self.m.cfg.ocean.dtuv,
                          self.m.cfg.ocean.dtts)
        return {k: float(v) for k, v in out.items()}
