"""Time-step integrals (tsi): scalar global diagnostics.

TPU-native re-design of mom_tsi.F / embm_tsi.F: global scalar means and
extrema written at `tsiint` intervals — the reference's de-facto
regression signal (SURVEY.md §4.4: two runs match iff their tsi streams
match).  All reductions run on device in one fused jit; the host gets a
small dict of floats.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class TsiDiagnostics:
    def __init__(self, ocean_model, embm_model=None,
                 deterministic=False):
        """deterministic=True: reduction-order-independent scalars
        (SURVEY §2.9 reduction budget / VERDICT r4 #10).  The device
        computes only per-COLUMN partials (the k axis is never
        sharded, so each column partial is bitwise identical under any
        (y, x) mesh layout); the horizontal sum runs on the host in
        float64 in fixed C order.  Two runs of the same state on
        different meshes then emit bit-identical tsi rows.  Extrema
        (psi max/min) are order-independent already."""
        self.m = ocean_model
        self.embm = embm_model
        self.deterministic = deterministic
        g = ocean_model.params.grid
        tmask = ocean_model.tmask
        dvol = (jnp.asarray(g.dzt)[:, None, None]
                * jnp.asarray(g.cst)[None, :, None]
                * jnp.asarray(g.dyt)[None, :, None]
                * jnp.asarray(g.dxt)[None, None, :]) * tmask
        self.dvol = dvol.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
        self.vol = jnp.sum(self.dvol)
        area = (jnp.asarray(g.cst)[:, None] * jnp.asarray(g.dyt)[:, None]
                * jnp.asarray(g.dxt)[None, :]) * tmask[0]
        self.area = area.at[:, 0].set(0.0).at[:, -1].set(0.0)
        self.area_tot = jnp.sum(self.area)
        self._compute = jax.jit(self._compute_impl)
        self._cols = jax.jit(self._column_partials_impl)

    def _column_partials_impl(self, ocean_state, atm_state=None,
                              ice_state=None):
        """Per-(j, i) partials of every sum-based scalar, plus the
        order-independent extrema."""
        m = self.m
        t = ocean_state.t
        u = m.full_velocity(ocean_state.u, ocean_state.psi0)
        cols = dict(
            o_tbar=jnp.sum(t[0] * self.dvol, axis=0),
            o_sbar=jnp.sum(t[1] * self.dvol, axis=0),
            o_ke=0.5 * jnp.sum((u[0] ** 2 + u[1] ** 2) * self.dvol,
                               axis=0),
            o_sst=t[0, 0] * self.area,
            _vol=jnp.sum(self.dvol, axis=0),
            _area=self.area,
        )
        ext = dict(o_psi_max=jnp.max(ocean_state.psi0) * 1e-12,
                   o_psi_min=jnp.min(ocean_state.psi0) * 1e-12)
        if atm_state is not None:
            interior = jnp.zeros_like(atm_state.at[0])
            interior = interior.at[1:-1, 1:-1].set(1.0)
            cols["a_sat"] = atm_state.at[0] * interior
            cols["a_shum"] = atm_state.at[1] * interior
            cols["_n_atm"] = interior
        if ice_state is not None:
            cols["i_area"] = ice_state.aice * self.area
            cols["i_vol"] = ice_state.hice * self.area
        return cols, ext

    def _compute_deterministic(self, ocean_state, atm_state, ice_state):
        cols, ext = self._cols(ocean_state, atm_state, ice_state)
        s = {k: float(np.asarray(v, np.float64).sum())
             for k, v in cols.items()}
        out = dict(
            o_tbar=s["o_tbar"] / s["_vol"],
            o_sbar=s["o_sbar"] / s["_vol"] * 1000.0 + 35.0,
            o_ke=s["o_ke"] / s["_vol"],
            o_sst=s["o_sst"] / s["_area"],
        )
        if atm_state is not None:
            out["a_sat"] = s["a_sat"] / s["_n_atm"]
            out["a_shum"] = s["a_shum"] / s["_n_atm"]
        if ice_state is not None:
            out["i_area"] = s["i_area"] * 1e-10
            out["i_vol"] = s["i_vol"] * 1e-15
        out.update({k: float(v) for k, v in ext.items()})
        return out

    def _compute_impl(self, ocean_state, atm_state=None, ice_state=None):
        m = self.m
        out = {}
        t = ocean_state.t
        out["o_tbar"] = jnp.sum(t[0] * self.dvol) / self.vol
        out["o_sbar"] = jnp.sum(t[1] * self.dvol) / self.vol * 1000.0 + 35.0
        u = m.full_velocity(ocean_state.u, ocean_state.psi0)
        dvol_u = self.dvol  # T-cell volume is fine for a KE index
        out["o_ke"] = 0.5 * jnp.sum((u[0] ** 2 + u[1] ** 2) * dvol_u) \
            / self.vol
        out["o_psi_max"] = jnp.max(ocean_state.psi0) * 1e-12
        out["o_psi_min"] = jnp.min(ocean_state.psi0) * 1e-12
        out["o_sst"] = jnp.sum(t[0, 0] * self.area) / self.area_tot
        if atm_state is not None:
            out["a_sat"] = jnp.sum(atm_state.at[0][1:-1, 1:-1]) \
                / (atm_state.at[0].shape[0] - 2) \
                / (atm_state.at[0].shape[1] - 2)
            out["a_shum"] = jnp.mean(atm_state.at[1][1:-1, 1:-1])
        if ice_state is not None:
            out["i_area"] = jnp.sum(ice_state.aice * self.area) * 1e-10
            out["i_vol"] = jnp.sum(ice_state.hice * self.area) * 1e-15
        return out

    def compute(self, ocean_state, atm_state=None, ice_state=None) -> dict:
        if self.deterministic:
            return self._compute_deterministic(ocean_state, atm_state,
                                               ice_state)
        out = self._compute(ocean_state, atm_state, ice_state)
        return {k: float(v) for k, v in out.items()}


class TsiWriter:
    """Appends tsi rows to a CSV file (the netCDF tsi stream analog)."""

    def __init__(self, path):
        self.path = path
        self._wrote_header = False

    def write(self, days: float, row: dict):
        import os
        keys = sorted(row)
        if not self._wrote_header and not os.path.exists(self.path):
            with open(self.path, "w") as f:
                f.write("days," + ",".join(keys) + "\n")
            self._wrote_header = True
        with open(self.path, "a") as f:
            f.write(f"{days:.4f}," +
                    ",".join(f"{row[k]:.10e}" for k in keys) + "\n")
