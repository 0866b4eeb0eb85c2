"""Conservation audits (global_sums.F `globalsum` equivalents).

Two instruments:

- ConservationAudit: ocean-only heat/salt inventories (round-1).
- FullAudit: the five-reservoir heat/water/carbon accounting of
  source/common/global_sums.F:74-260 — atmosphere, snow+ice, land,
  ocean, (sediments) — with the reference's unit conversions, plus
  SEGMENT-CLOSURE checks: the change of each ocean inventory must equal
  the boundary fluxes the coupler applied (the instrument that
  certifies the coupling plumbing; drift = bug, SURVEY.md §4.2).

Called at run start, per segment/year, and at run end by the driver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.embm import constants as C


class ConservationAudit:
    def __init__(self, ocean_model, deterministic=False):
        """deterministic=True: reduction-order-independent sums.  The
        device computes only per-COLUMN contributions (the k axis is
        never sharded, so each column partial is bitwise identical
        under any (y, x) mesh layout), and the horizontal sum runs on
        the host in float64 in fixed C order.  Sharded and unsharded
        runs then produce bitwise-equal inventories — the
        deterministic-reduction option of SURVEY §2.9/row 64."""
        g = ocean_model.params.grid
        tmask = ocean_model.tmask
        dvol = (jnp.asarray(g.dzt)[:, None, None]
                * jnp.asarray(g.cst)[None, :, None]
                * jnp.asarray(g.dyt)[None, :, None]
                * jnp.asarray(g.dxt)[None, None, :]) * tmask
        # count each physical cell once (exclude duplicated columns)
        self.dvol = dvol.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
        self.deterministic = deterministic
        self._inv = jax.jit(self._inventories)
        self._cols = jax.jit(self._column_partials)

    def _inventories(self, t):
        return dict(
            heat=jnp.sum(t[0] * self.dvol),      # [K cm^3]
            salt=jnp.sum(t[1] * self.dvol),      # [model-S cm^3]
        )

    def _column_partials(self, t):
        return dict(heat=jnp.sum(t[0] * self.dvol, axis=0),
                    salt=jnp.sum(t[1] * self.dvol, axis=0))

    def inventories(self, ocean_state) -> dict:
        if self.deterministic:
            cols = self._cols(ocean_state.t)
            return {k: float(np.asarray(v, np.float64).sum())
                    for k, v in cols.items()}
        return {k: float(v) for k, v in self._inv(ocean_state.t).items()}

    def drift(self, before: dict, after: dict) -> dict:
        out = {}
        for k in before:
            # scale by the larger magnitude (a zero initial inventory,
            # e.g. model-unit salt, must not blow the relative number)
            scale = max(abs(before[k]), abs(after[k]), 1e-30)
            out[k] = (after[k] - before[k]) / scale
        return out


class FullAudit:
    """Heat/water/carbon inventories across atmosphere, snow+ice, land,
    ocean and sediments (global_sums.F:74-260), and ocean segment
    closure against the applied boundary fluxes.

    Units follow the reference conversions (global_sums.F:222-260):
    heat in Joules, water in kg, carbon in kg.
    """

    REDCTN = 7.1e-3   # mol C per mmol N detritus (npzd redctn + molw)

    def __init__(self, coupled_model):
        cm = coupled_model
        g = cm.grid
        area = (np.asarray(g.cst)[:, None] * np.asarray(g.dyt)[:, None]
                * np.asarray(g.dxt)[None, :])
        area[:, 0] = 0.0
        area[:, -1] = 0.0
        area[0, :] = 0.0
        area[-1, :] = 0.0
        self.area = jnp.asarray(area, cm.cfg.np_dtype)       # [cm^2]
        self.ocean_area = self.area * (np.asarray(cm.topo.kmt) > 0)
        dvol = (jnp.asarray(g.dzt)[:, None, None] * self.area[None]
                * cm.ocean.tmask)
        self.dvol = dvol                                     # [cm^3]
        self.idx = cm.ocean.tracer_index
        self.lmsk = cm.embm.lmsk
        self.tmsk = cm.embm.tmsk
        self.cm = cm
        self._inv = jax.jit(self._inventories_impl)

    # ------------------------------------------------------------------
    def _inventories_impl(self, state, co2ccn):
        idx = self.idx
        out = {}
        at = state.atm.at
        # atmosphere (global_sums.F:139-147, 222-229)
        taf = jnp.sum(at[1] * self.area)                     # shum cm^2
        tah = jnp.sum(at[0] * self.area)
        out["atm_heat_J"] = (taf * C.RHOATM * C.SHQ * C.VLOCN
                             + tah * C.CPATM * C.RHOATM * C.SHT) * 1e-7
        out["atm_water_kg"] = taf * C.RHOATM * C.SHQ * 1e-3
        out["atm_carbon_kg"] = (co2ccn * jnp.sum(self.area)
                                * 4.138e-7 * C.RHOATM * C.SHC * 1e-3)
        # snow + ice water [kg]: h in cm over the cell area
        ice = state.ice
        out["ice_water_kg"] = (
            jnp.sum(ice.hice * ice.aice * self.area) * C.RHOICE * 1e-3
            + jnp.sum(ice.hsno * self.area) * C.RHOSNO * 1e-3)
        # land: soil moisture [kg] (soilm in g/cm^2-ish EMBM units,
        # global_sums.F tlf: soilm*area*1e-3) + carbon pools
        out["land_water_kg"] = jnp.sum(
            state.atm.soilm * self.lmsk * self.area) * 1e-3
        if state.land is not None:
            from ..models.land.mtlm import SIGL, A_WL, B_WL
            lai = state.land.lai
            leaf = jnp.asarray(SIGL)[:, None, None] * lai
            wood = jnp.asarray(A_WL)[:, None, None] * lai \
                ** jnp.asarray(B_WL)[:, None, None]
            cv = jnp.sum(state.land.frac[:leaf.shape[0]]
                         * (leaf + wood), axis=0)
            out["land_carbon_kg"] = jnp.sum(
                (cv + state.land.cs) * self.lmsk * self.area) * 1e-4
        # ocean (global_sums.F:199-221, 243-258)
        t = state.ocean.t
        rhocp = 4.186e7     # erg/cm^3/K (~1 cal/cm^3/K seawater)
        out["ocn_heat_J"] = jnp.sum(t[0] * self.dvol) * rhocp * 1e-7
        out["ocn_salt_kg"] = jnp.sum(t[1] * self.dvol)   # model units cm^3
        if "dic" in idx:
            toc = jnp.sum(t[idx.idic] * self.dvol)
            for name in ("phyt", "zoop", "detr", "diaz"):
                if name in idx:
                    toc = toc + jnp.sum(t[idx[name]] * self.dvol) \
                        * self.REDCTN
            out["ocn_carbon_kg"] = toc * 12.0e-9     # umol -> kg C
        return out

    def inventories(self, state, co2ccn=280.0) -> dict:
        co2 = jnp.asarray(co2ccn, self.area.dtype)
        return {k: float(v) for k, v in self._inv(state, co2).items()}

    # ------------------------------------------------------------------
    def ocean_closure(self, before_t, after_t, forcing, nsteps,
                      dtts) -> dict:
        """Ocean inventory change vs applied boundary fluxes over
        ``nsteps`` tracer steps: d(inv)/dt must equal the area-summed
        stf (+ btf) for every tracer (the tracer step is conservative
        in flux form).  Returns per-tracer relative closure errors."""
        total_dt = nsteps * dtts
        errs = {}
        names = [tr.name for tr in self.idx.tracers]
        d_inv = jnp.einsum("nkji,kji->n",
                           jnp.asarray(after_t) - jnp.asarray(before_t),
                           self.dvol)
        flux = jnp.sum(forcing.stf * self.ocean_area[None],
                       axis=(1, 2)) * total_dt
        if forcing.btf is not None:
            flux = flux - jnp.sum(forcing.btf * self.ocean_area[None],
                                  axis=(1, 2)) * total_dt
        scale = jnp.maximum(jnp.abs(flux), 1e-30)
        rel = np.asarray((d_inv - flux) / scale)
        for k, name in enumerate(names):
            errs[name] = float(rel[k])
        return errs
