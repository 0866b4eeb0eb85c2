"""Coupled driver: the segment loop tying ocean, atmosphere, and sea ice.

TPU-native re-design of the reference coupling architecture
(source/common/UVic_ESCM.F:296-416 segment loop, gasbc.F, gosbc.F):

  for each segment (segtim days):
    gasbc  : ocean surface state -> atmosphere boundary conditions
    ntspas x embm step, with the ice model inside (fluxes -> ice thermo
             + EVP dynamics + advection -> humidity solve -> precip ->
             temperature solve -> flux accumulation, embm.F:39-95)
    gosbc  : time-mean accumulated fluxes -> ocean surface forcing
             (heat -> cal/cm^2/s ~= K cm/s, freshwater -> virtual salt
             flux, wind + ice stress -> momentum flux, gosbc.F:66-145)
    ntspos x ocean step

The sbc "flux bus" (csbc.h slot registry) becomes explicit typed fields.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import ModelConfig
from ..constants import EPSLN, OMEGA, RADIAN
from ..core.state import OceanState
from ..models.embm import constants as C
from ..models.embm.model import AtmState, EmbmModel
from ..models.ice.evp import evp_dynamics
from ..models.ice.thermo import (IceState, freezing_point, ice_advection,
                                 ice_thermodynamics, init_ice_state)
from ..models.ocean.model import OceanModel, SurfaceForcing, make_ocean

SOCN = 0.035  # global-mean absolute salinity for virtual salt flux


@struct.dataclass
class CoupledState:
    ocean: OceanState
    atm: AtmState
    ice: IceState
    land: Any = None       # LandState when cfg.land.enabled
    sed: Any = None        # SedState when cfg.sed.enabled
    cpts: Any = None       # CptsState when cfg.ice.cpts > 0


class CoupledModel:
    def __init__(self, cfg: ModelConfig | None = None,
                 topo_kind: str = "world", kmt=None):
        cfg = cfg or ModelConfig()
        # config consistency rules (checks.F + chkcpl): fatal
        # inconsistencies raise; adjust-and-warn rules are kept for
        # the caller/logs
        from ..checks import validate
        self.config_warnings = validate(cfg)
        if cfg.ocean.convect_brine and (cfg.ice.cpts > 0
                                        or not cfg.ice.enabled):
            raise ValueError("O_convect_brine requires the 0-layer ice "
                             "model (cpts carries its own categories)")
        self.cfg = cfg
        self._topo_kind = topo_kind
        self.ocean = make_ocean(cfg, kmt=kmt, topo_kind=topo_kind)
        grid = self.ocean.params.grid
        topo = self.ocean.params.topo
        self.grid = grid
        self.topo = topo
        embm_kw = {}
        stress_clim = None
        if topo_kind == "earth":
            # the reference reads elevation, winds, wind stress,
            # coalbedo and diffusivity from data files not shipped;
            # the earth config authors them in-repo (core/earth.py)
            from ..core.earth import (earth_atm_coalbedo, earth_atm_diff,
                                      earth_elevation, earth_surface_wind,
                                      earth_wind_stress)
            diff_t, diff_q = earth_atm_diff(grid)
            winds_e, wspd_e = earth_surface_wind(grid)
            embm_kw = dict(elev=earth_elevation(grid), winds=winds_e,
                           wspd=wspd_e, diff_t=diff_t, diff_q=diff_q,
                           atm_coalbedo=earth_atm_coalbedo(grid),
                           dry_soil_albedo=0.15)
            stress_clim = earth_wind_stress(grid)
        self.embm = EmbmModel(grid, topo, cfg.embm, dtype=cfg.np_dtype,
                              **embm_kw)

        # coupling cadence (chkcpl semantics)
        seg_s = cfg.time.segtim_days * 86400.0
        self.ntspas = max(1, round(seg_s / cfg.embm.dtatm))
        self.ntspos = max(1, round(seg_s / cfg.ocean.dtts))

        jmt, imt = grid.jmt, grid.imt
        area = (grid.cst[:, None] * grid.dyt[:, None]
                * grid.dxt[None, :]) * (topo.kmt > 0)
        area[:, 0] = 0.0
        area[:, -1] = 0.0
        self.area2d = jnp.asarray(area, dtype=cfg.np_dtype)
        self.co2ccn = 280.0     # atmospheric CO2 [ppmv] (co2ccn)
        self.anthro = 0.0       # CO2 radiative forcing (co2forc)
        self.cfcccn = None      # (cfc11 N,S, cfc12 N,S) [pptv]
        self.dc14ccn = 0.0      # atmospheric Delta-14C [permil]
        self.solar_scale = 1.0  # transient (solar - volcanic)/solarconst
        self.sulph = None       # sulphate coalbedo-reduction field
        self.sealev = 0.0       # sea level rel. present [cm] (sealevdata)
        self.landice = None     # (hicel, aicel) paleo ice sheets (icedata)
        self._icesheet_scale = None
        from ..io.forcing import sulphate_pattern
        self._sulph_pattern = jnp.asarray(
            sulphate_pattern(grid.yt, imt=grid.imt), dtype=cfg.np_dtype)
        self.awind = None
        if cfg.embm.awind:
            from ..models.embm.winds import WindFeedback
            aw_area = (grid.cst[:, None] * grid.dyt[:, None]
                       * grid.dxt[None, :])
            self.awind = WindFeedback(grid, aw_area)
        self.tlat_deg = jnp.asarray(
            np.broadcast_to(grid.yt[:, None],
                            (grid.jmt, grid.imt)), dtype=cfg.np_dtype)
        self.tlat_rad2d = jnp.deg2rad(self.tlat_deg)
        self.relyr = 0.0        # fractional year, advanced by run()
        self.year0 = cfg.time.year0
        self.transient = None   # set via set_transient_forcing()
        f = 2.0 * OMEGA * np.sin(grid.yu / RADIAN)
        self.fcor_u = jnp.asarray(
            np.broadcast_to(f[:, None], (jmt, imt)), dtype=cfg.np_dtype)
        self.umsk = jnp.asarray((topo.kmu > 0).astype(np.float64),
                                dtype=cfg.np_dtype)
        # land-cell areas [cm^2] for the global nep integral (gasbc.F)
        self.area2d_land = jnp.asarray(
            (grid.cst[:, None] * grid.dyt[:, None] * grid.dxt[None, :])
            * np.asarray(self.embm.lmsk), dtype=cfg.np_dtype)
        self.last_nep_kgC_s = None

        # river routing (rivmodel)
        from ..models.embm.rivers import RiverModel
        area_full = (grid.cst[:, None] * grid.dyt[:, None]
                     * grid.dxt[None, :])
        self.rivers = RiverModel(topo.kmt, area_full, grid.cyclic)

        # wind stress on the ocean/ice: the earth config uses the
        # authored climatology (A_windstr analog); otherwise derive a
        # bulk stress from the prescribed EMBM winds
        if stress_clim is not None:
            self.taux_w = jnp.asarray(stress_clim[0], cfg.np_dtype)
            self.tauy_w = jnp.asarray(stress_clim[1], cfg.np_dtype)
        else:
            w = self.embm.winds
            wmag = jnp.sqrt(w[0] ** 2 + w[1] ** 2) + EPSLN
            self.taux_w = C.RHOATM * C.CDATM * wmag * w[0]
            self.tauy_w = C.RHOATM * C.CDATM * wmag * w[1]

        # ice-velocity high-latitude zonal filter (filuvice,
        # ice.F:46,180-300: the reference Fourier/FIR-filters uice/vice
        # when O_ice_fourfil/firfil) plus a per-cell advective-CFL
        # speed cap: at the last Arctic row the cells are ~7 km wide
        # and one dtatm=54000 s upstream sweep at ~1 m/s has CFL ~ 8 —
        # unfiltered, unclamped ice velocity piles ice into the polar
        # cells until the coupled system blows up (triaged r3:
        # hice -> 3e11 cm at (j=100, i<10) before the ocean NaN'd)
        self.filt_uvice = None
        if cfg.ocean.fourfil and cfg.ice.enabled and cfg.ice.evp:
            from ..ops.filters import build_hlat_filter
            umask2 = (topo.kmu > 0).astype(np.float64)
            self.filt_uvice = build_hlat_filter(
                cfg.ocean.hlat_filter, umask2, np.asarray(grid.yu),
                grid.imt, "asymmetric", grid.cyclic, cfg.np_dtype)
        dx_u = (np.asarray(grid.csu)[:, None]
                * np.asarray(grid.dxu)[None, :])
        dy_u = np.broadcast_to(np.asarray(grid.dyu)[:, None], (jmt, imt))
        self.uice_cap = jnp.asarray(0.4 * dx_u / cfg.embm.dtatm,
                                    cfg.np_dtype)
        self.vice_cap = jnp.asarray(0.4 * dy_u / cfg.embm.dtatm,
                                    cfg.np_dtype)

        # multi-category ice (cpts.F) static tables
        if cfg.ice.cpts > 0:
            from ..models.ice import cpts as cpts_mod
            self._cpts_hstar = cpts_mod.HSTAR[cfg.ice.cpts]
            self._cpts_saltz = jnp.asarray(
                cpts_mod.salinity_profile(cfg.ice.nlay), dtype=cfg.np_dtype)

        self._atm_ice_step = jax.jit(self._atm_ice_step_impl,
                                     static_argnames=("mixing",))
        self._segment_jit = None   # fused-segment program cache

    # ------------------------------------------------------------------
    def init_state(self, t_init=None) -> CoupledState:
        grid = self.grid
        ocean = self.ocean.init_state(
            t_init if t_init is not None else self._default_ocean_ic())
        atm = self.embm.init_state()
        ice = init_ice_state(grid.jmt, grid.imt, self.cfg.np_dtype)
        land = None
        if self.cfg.land.enabled:
            from ..models.land.mtlm import init_land_state
            land = init_land_state(grid.jmt, grid.imt,
                                   np.asarray(self.embm.lmsk),
                                   self.cfg.np_dtype)
        sed = None
        if self.cfg.sed.enabled:
            if self.cfg.sed.porewater:
                from ..models.sed.porewater import init_porewater
                sed = init_porewater(grid.jmt, grid.imt,
                                     self.cfg.np_dtype)
            else:
                from ..models.sed.sediment import init_sed_state
                sed = init_sed_state(grid.jmt, grid.imt,
                                     self.cfg.np_dtype)
        cpts_st = None
        if self.cfg.ice.cpts > 0:
            from ..models.ice.cpts import init_cpts_state
            cpts_st = init_cpts_state(self.cfg.ice.cpts, self.cfg.ice.nlay,
                                      grid.jmt, grid.imt, self.cfg.np_dtype)
        return CoupledState(ocean=ocean, atm=atm, ice=ice, land=land,
                            sed=sed, cpts=cpts_st)

    def _default_ocean_ic(self):
        g = self.grid
        vals = np.array([t.init for t in self.ocean.tracer_index.tracers])
        t0 = np.broadcast_to(
            vals[:, None, None, None],
            (self.ocean.nt, g.km, g.jmt, g.imt)).copy()
        if self._topo_kind == "earth":
            # Levitus-like zonal-mean hydrography (setmom.F ic read
            # analog): the polar halocline lets winter sea ice form on
            # a multi-year spinup (core/earth.py:earth_initial_ts)
            from ..core.earth import earth_initial_ts
            temp, salt = earth_initial_ts(g, np.asarray(self.topo.kmt))
            t0[0] = temp
            t0[1] = salt
            t0 *= np.asarray(self.topo.tmask)
            return t0
        lat = np.broadcast_to(g.yt[:, None], (g.jmt, g.imt))
        sst = 25.0 * np.cos(np.deg2rad(lat)) ** 2
        prof = np.exp(-np.asarray(g.zt) / 1000.0e2)
        t0[0] = sst[None] * prof[:, None, None] + 2.0
        t0[1] = 0.0
        t0 *= np.asarray(self.topo.tmask)
        return t0

    # ------------------------------------------------------------------
    def gasbc(self, state: CoupledState):
        """Ocean surface state -> atm boundary conditions (gasbc.F)."""
        sst = state.ocean.t[0, 0]
        sss = state.ocean.t[1, 0] * 1000.0 + 35.0
        frzpt = freezing_point(sss)
        # under-ice water cannot be below freezing for flux purposes
        return sst, sss, frzpt

    # ------------------------------------------------------------------
    def _atm_ice_step_impl(self, atm: AtmState, ice: IceState, sst, frzpt,
                           uocn, vocn, anthro, wind_pkg=None,
                           solins=None, cpts_st=None, land_gc=None,
                           sulph=None, landice=None, *, mixing: bool):
        """One atmosphere step with the ice model inside (embm.F:39-95).
        wind_pkg: optional (winds, wspd, taux_w, tauy_w) from the
        anomalous-wind feedback (winds.F add_awind).
        solins: optional seasonal TOA insolation (else annual mean).
        land_gc: MTLM canopy conductance [cm/s] from the previous land
        step — the land->atm feedback channel (glsbc.F)."""
        embm = self.embm
        cfg = self.cfg.embm
        if isinstance(mixing, bool):
            dts = cfg.dtatm if mixing else 2.0 * cfg.dtatm
            at_old = atm.at if mixing else atm.atm1
        else:
            # traced mixing flag (the fused-segment scan path): select
            # the timestep and time level with `where`, one trace
            # covers both step kinds (mom.F-style leapfrog control)
            dts = jnp.where(mixing, cfg.dtatm, 2.0 * cfg.dtatm)
            at_old = jnp.where(mixing, atm.at, atm.atm1)
        if wind_pkg is None:
            winds_a, wspd_a = embm.winds, embm.wspd
            taux_w, tauy_w = self.taux_w, self.tauy_w
        else:
            winds_a, wspd_a, taux_w, tauy_w = wind_pkg
        solins_a = embm.solins if solins is None else solins

        hicel = aicel = None
        if landice is not None:
            hicel, aicel = landice
        fl = embm.fluxes(atm, sst, dts=dts, anthro=anthro, wspd=wspd_a,
                         solins=solins_a, land_gc=land_gc, sulph=sulph,
                         hicel=hicel, aicel=aicel)

        # ---- sea ice (ice.F): dynamics, advection, thermodynamics ----
        use_cpts = self.cfg.ice.cpts > 0 and cpts_st is not None
        if use_cpts:
            from ..models.ice import cpts as cpts_mod
        xint = yint = None
        if self.cfg.ice.enabled:
            if self.cfg.ice.evp:
                uice, vice, sig_n, xint, yint = evp_dynamics(
                    ice.uice[0], ice.uice[1], ice.hice, ice.aice,
                    embm.tmsk, self.umsk, self.fcor_u,
                    taux_w, tauy_w, uocn, vocn,
                    self.ocean.g, cfg.dtatm, self.cfg.ice.ndte,
                    embm.cyclic, sig_in=ice.sig)
                ice = ice.replace(sig=sig_n)
                # filuvice + advective-CFL cap (see __init__ note)
                if self.filt_uvice is not None:
                    uice = self.filt_uvice(uice)
                    vice = self.filt_uvice(vice)
                if self.cfg.ice.cfl_cap:
                    # advective-CFL speed cap (config-gated global
                    # stabilization; see IceConfig.cfl_cap — sig above
                    # is from the unclamped velocities by design)
                    uice = jnp.clip(uice, -self.uice_cap, self.uice_cap)
                    vice = jnp.clip(vice, -self.vice_cap, self.vice_cap)
                if use_cpts:
                    # advect the full thickness distribution, ridge under
                    # convergence, re-bin (adv_ridge_cpts, cpts.F:579-675)
                    from ..ops import stencil as _st
                    g = self.ocean.g
                    cpts_st = cpts_mod.cpts_advect(
                        cpts_st, uice, vice, g, dts,
                        self.cfg.ice.niats, embm.cyclic)
                    ue = 0.5 * (uice + _st.S(uice))
                    vn = 0.5 * (vice + _st.W(vice))
                    vnc = vn * g.csu[:, None]
                    divu = g.cstr[:, None] * (
                        (ue - _st.W(ue)) * 2.0 * g.dxt2r[None, :]
                        + (vnc - _st.S(vnc)) * 2.0 * g.dyt2r[:, None])
                    cpts_st = cpts_mod.ridge(cpts_st, divu, dts,
                                             self._cpts_hstar)
                    cpts_st = cpts_mod.rebin(cpts_st, self._cpts_hstar)
                    hice, aice, hsno, _ = cpts_mod.aggregate(cpts_st)
                else:
                    hice = ice_advection(ice.hice, uice, vice,
                                         self.ocean.g, dts,
                                         self.cfg.ice.niats, embm.cyclic)
                    aice = ice_advection(ice.aice, uice, vice,
                                         self.ocean.g, dts,
                                         self.cfg.ice.niats, embm.cyclic)
                    hsno = ice_advection(ice.hsno, uice, vice,
                                         self.ocean.g, dts,
                                         self.cfg.ice.niats, embm.cyclic)
                aice = jnp.clip(aice, 0.0, 1.0)
                hice = jnp.maximum(hice, 0.0)
                hsno = jnp.maximum(hsno, 0.0)
                ice = ice.replace(hice=hice, aice=aice, hsno=hsno,
                                  uice=jnp.stack([uice, vice]))
            ice, flx, oadj = ice_thermodynamics(
                ice, atm.at[0], atm.at[1], fl["rh"], sst, frzpt,
                solins_a, embm.aca, wspd_a, embm.elev, embm.tmsk,
                fl["dnswr"], fl["uplwr"], fl["upsens"], fl["upltnt"],
                fl["evap"], dts, float(self.grid.zw[0]), aicel=aicel)
            if use_cpts:
                # multi-category thermodynamics over ocean cells replaces
                # the 0-layer result; land-snow branch stays from therm.F
                tm = embm.tmsk
                cpts_st, cflx, cadj, _ = cpts_mod.cpts_thermo(
                    cpts_st, atm.at[0], atm.at[1], sst, frzpt,
                    solins_a, embm.aca, wspd_a, tm, dts,
                    self._cpts_saltz, self._cpts_hstar,
                    fl["dnswr"], fl["uplwr"], fl["upsens"],
                    fl["upltnt"], fl["evap"])
                cpts_st = cpts_mod.rebin(cpts_st, self._cpts_hstar)
                flx = {k: tm * cflx[k] + (1.0 - tm) * flx[k] for k in cflx}
                oadj = dict(
                    heat=tm * cadj["heat"]
                    + (1.0 - tm) * oadj["heat"],
                    freshwater=tm * cadj["freshwater"]
                    + (1.0 - tm) * oadj["freshwater"])
                hice_c, aice_c, hsno_c, tice_c = cpts_mod.aggregate(cpts_st)
                ice = ice.replace(
                    hice=tm * hice_c + (1.0 - tm) * ice.hice,
                    aice=tm * jnp.clip(aice_c, 0.0, 1.0)
                    + (1.0 - tm) * ice.aice,
                    hsno=tm * hsno_c + (1.0 - tm) * ice.hsno,
                    tice=tm * tice_c + (1.0 - tm) * ice.tice)
            dnswr, uplwr = flx["dnswr"], flx["uplwr"]
            upsens, upltnt = flx["upsens"], flx["upltnt"]
            evap = flx["evap"]
        else:
            dnswr, uplwr = fl["dnswr"], fl["uplwr"]
            upsens, upltnt = fl["upsens"], fl["upltnt"]
            evap = fl["evap"]
            oadj = dict(heat=jnp.zeros_like(sst),
                        freshwater=jnp.zeros_like(sst))

        # ---- humidity transport + precipitation ----------------------
        fa_q = dts / (C.RHOATM * C.SHQ)
        forc_q = (fa_q * evap).at[0, :].set(0.0).at[-1, :].set(0.0)
        coefs_q = embm._coef(embm.diff_q, dts, winds=winds_a)
        rhs_q = embm._bc(at_old[1] + forc_q)
        shum = embm.solve_tracer(rhs_q, atm.at[1], coefs_q,
                                 embm.solver_tol, cfg.solver_maxiter)
        flux_shum_land = evap * embm.lmsk
        shum, precip, psno, rh, soilm_new, runoff = embm.precipitate(
            shum, atm, flux_shum_land, jnp.ones_like(evap), dts,
            hicel=hicel)

        # snowfall accumulates on sea ice / land snow (fluxes.F:363-420):
        # over ocean only the ice-covered fraction holds snow
        if self.cfg.ice.enabled:
            fc = dts / C.RHOSNO
            hsno_max = 1000.0
            psno = jnp.where(ice.hsno < hsno_max, psno, 0.0)
            psno_eff = psno * jnp.where(embm.tmsk > 0, ice.aice, 1.0)
            ice = ice.replace(hsno=ice.hsno + fc * psno_eff)
            if use_cpts:
                # distribute snowfall over categories by area fraction
                atot = jnp.maximum(cpts_st.A.sum(0), 1e-10)
                cpts_st = cpts_st.replace(
                    hseff=cpts_st.hseff + fc * psno_eff * embm.tmsk
                    * cpts_st.A / atot)
            psno = psno_eff

        # ---- temperature transport -----------------------------------
        fa = dts / (C.CPATM * C.RHOATM * C.SHT)
        fb_l = dts * C.VLOCN / (C.CPATM * C.RHOATM * C.SHT)
        fc = dts * C.SLICE / (C.CPATM * C.RHOATM * C.SHT) - fb_l
        fd = C.SCATTER * (1.0 + C.PASS)
        forc_t = fa * (solins_a * embm.aca * fd
                       - dnswr * C.SCATTER - fl["outlwr"]
                       + uplwr + upsens)
        forc_t = (forc_t + precip * fb_l + fc * psno)
        forc_t = forc_t.at[0, :].set(0.0).at[-1, :].set(0.0)
        rhs_t = embm._bc(at_old[0] + forc_t)
        coefs_t = embm._coef(embm.diff_t, dts, winds=winds_a)
        sat = embm.solve_tracer(rhs_t, atm.at[0], coefs_t,
                                embm.solver_tol, cfg.solver_maxiter)

        new_atm = AtmState(
            at=jnp.stack([sat, shum]), atm1=atm.at,
            soilm=soilm_new, soilm1=atm.soilm, surf=fl["surf"],
            nats=jnp.where(mixing, 1, atm.nats + 1))

        # ---- flux accumulation for the coupler (sum_flux) ------------
        ocean_msk = embm.tmsk
        # route land runoff to ocean discharge cells (rivmodel)
        disch = self.rivers.discharge(runoff * embm.lmsk)
        # ocean-surface stress: wind stress plus, where moving ice is
        # present, the ice internal stress divergence (embm.F:188-201
        # flux(nat+1) += dts*(sbc(itaux) + xint) over U cells)
        taux_o, tauy_o = taux_w, tauy_w
        if xint is not None and self.cfg.ice.ice_ocn_stress == "draglaw":
            # ocean-side ice stress = reaction to the EVP water drag
            # (IceConfig.ice_ocn_stress): tau_io = rho c_w |du| R(du)
            # with the turning angle, blended by the ice fraction at
            # U points.  A jammed pack (ui -> 0 with uo small)
            # transmits only this drag, not the ridging force.
            from ..models.ice.evp import COSTH, DRAGW_RHO, SINTH
            ui, vi = ice.uice[0], ice.uice[1]
            dux = ui - uocn
            dvy = vi - vocn
            vrel = DRAGW_RHO * jnp.sqrt(dux ** 2 + dvy ** 2)
            sinth_s = jnp.sign(self.fcor_u) * SINTH
            tio_x = vrel * (COSTH * dux - sinth_s * dvy)
            tio_y = vrel * (COSTH * dvy + sinth_s * dux)
            a = ice.aice
            from ..ops.stencil import E as _E, N as _N
            aice_u = 0.25 * (a + _N(a) + _E(a) + _N(_E(a)))
            taux_o = taux_w * (1.0 - aice_u) \
                + (tio_x * aice_u) * self.umsk
            tauy_o = tauy_w * (1.0 - aice_u) \
                + (tio_y * aice_u) * self.umsk
        elif xint is not None:
            cap = self.cfg.ice.ice_ocn_stress_cap
            if cap > 0.0:
                mag = jnp.sqrt(xint ** 2 + yint ** 2)
                scl = jnp.minimum(1.0, cap / jnp.maximum(mag, 1e-12))
                xint = xint * scl
                yint = yint * scl
            taux_o = taux_w + xint * self.umsk
            tauy_o = tauy_w + yint * self.umsk
        # TOA energy budget fields (global_sums.F planetary balance):
        # planetary absorbed shortwave = atmosphere-absorbed part
        # (solins*aca*scatter*(1+pass), the forc_t SW source) plus the
        # surface-absorbed part after the ice/snow blend, minus what the
        # surface reflects back through the scattering layer.  Net TOA
        # (asw - olr) -> 0 is the equilibrium condition the reference's
        # tuned data fields encode (setembm.F); the earth-config tuning
        # closes on this diagnostic.
        asw = (solins_a * embm.aca * C.SCATTER * (1.0 + C.PASS)
               + dnswr * (1.0 - C.SCATTER))
        acc = dict(
            heat=dts * (dnswr - uplwr - upltnt - upsens) * ocean_msk
            + oadj["heat"],
            freshwater=dts * (precip - evap - psno + disch) * ocean_msk
            + oadj["freshwater"],
            taux=dts * taux_o,
            tauy=dts * tauy_o,
            swr=dts * dnswr,
            wspd=dts * wspd_a,
            toa_sw=dts * asw,
            olr=dts * fl["outlwr"],
            precip=dts * precip,
            psno=dts * psno,
            evap=dts * evap,
            runoff=dts * runoff,
            uplwr=dts * uplwr,
            upsens=dts * upsens,
            upltnt=dts * upltnt,
            time=dts,
        )
        if self.cfg.ocean.convect_brine and "brine_open" in oadj:
            # therm.F:440-460 cbf/cba accumulators
            acc["cbf"] = jnp.stack([oadj["brine_open"],
                                    oadj["brine_ice"]])
            acc["cba"] = dts * jnp.stack([oadj["brine_ao"],
                                          oadj["brine_ai"]])
        return new_atm, ice, acc, cpts_st

    # ------------------------------------------------------------------
    def gosbc(self, acc, state: CoupledState, sst, sss, swr_mean,
              sed_flux=None, co2ccn=None, cfcccn=None, dc14ccn=None,
              relyr=None):
        """Accumulated fluxes -> ocean forcing (gosbc.F:66-145), plus
        gas-exchange and normalized virtual fluxes for the bgc tracers
        (gasbc.F:310-470, gosbc.F:310-365).  sed_flux: dict of sediment
        dissolution fluxes [umol/cm^2/s, positive into the ocean] that
        enter the BOTTOM-cell tracer flux (tracer.F sed block).
        co2ccn/cfcccn/dc14ccn/relyr default to the host-side attributes
        (the fused-segment path passes them as traced scalars)."""
        from ..models.ocean.model import make_forcing

        co2ccn = self.co2ccn if co2ccn is None else co2ccn
        cfcccn = self.cfcccn if cfcccn is None else cfcccn
        dc14ccn = self.dc14ccn if dc14ccn is None else dc14ccn
        relyr = self.relyr if relyr is None else relyr
        atatm = acc["time"]
        fh = 2.389e-8 / atatm          # erg/cm^2/s -> cal/cm^2/s ~ K cm/s
        fs = -SOCN / atatm             # freshwater -> virtual salt flux
        tmsk = self.embm.tmsk
        hflx = fh * acc["heat"] * tmsk
        cbf_salt = cba_w = None
        if "cbf" in acc:
            # O_convect_brine: the ice growth/melt part of the virtual
            # salt flux is delivered through per-category convection
            # (convect_brine.F) instead of the surface row
            m = acc["cbf"]
            sflx = fs * (acc["freshwater"] - m.sum(0)) * tmsk
            cbf_salt = fs * m * tmsk[None]
            cba_w = jnp.clip(acc["cba"] / atatm, 0.0, 1.0) * tmsk[None]
        else:
            sflx = fs * acc["freshwater"] * tmsk
        smf = jnp.stack([acc["taux"], acc["tauy"]]) / atatm / 1.035

        idx = self.ocean.tracer_index
        nt = self.ocean.nt
        stf = jnp.zeros((nt,) + hflx.shape, hflx.dtype)
        stf = stf.at[0].set(hflx).at[1].set(sflx)

        if nt > 2:
            from ..models.bgc.gasx import surface_gas_fluxes
            surf = state.ocean.t[:, 0]
            ao = (1.0 - state.ice.aice) * tmsk
            cfc_atm = None
            if cfcccn is not None and "cfc11" in idx:
                from ..models.bgc.gasx import hemispheric_blend
                c11n, c11s, c12n, c12s = cfcccn
                cfc_atm = (hemispheric_blend(self.tlat_deg, c11n, c11s),
                           hemispheric_blend(self.tlat_deg, c12n, c12s))
            wspd_mean = acc["wspd"] / atatm
            gflux, _ = surface_gas_fluxes(
                sst, sss, wspd_mean, ao, surf, idx,
                co2ccn=co2ccn, cfc_atm=cfc_atm,
                dc14ccn=dc14ccn)
            # normalized virtual fluxes (gosbc.F:312-364): every bgc
            # tracer follows the salt flux anomaly scaled by its global
            # average surface concentration
            area = self.area2d
            tsflx = jnp.sum(sflx * area) / jnp.sum(area)
            vflux = (sflx - tsflx) / SOCN
            gaost = jnp.sum(surf * area[None], axis=(1, 2)) \
                / jnp.sum(area)
            virt = gaost[:, None, None] * vflux[None]
            virt = virt.at[0].set(0.0).at[1].set(0.0)
            stf = (stf + gflux + virt) * tmsk[None]

        btf = None
        if sed_flux is not None:
            # kernel sign convention: btf NEGATIVE = upward flux into
            # the bottom cell (1 umol/cm^2/s == 1 (mol/m^3)(cm/s))
            btf = jnp.zeros((nt,) + hflx.shape, hflx.dtype)
            btf = btf.at[idx.idic].add(-sed_flux["dic"])
            if "alk" in idx:
                btf = btf.at[idx.ialk].add(-sed_flux["alk"])

        return make_forcing(smf, stf, swr=swr_mean, aice=state.ice.aice,
                            hice=state.ice.hice, hsno=state.ice.hsno,
                            relyr=relyr, btf=btf, cbf=cbf_salt,
                            cba=cba_w)

    # ------------------------------------------------------------------
    def _segment_scalars(self) -> dict:
        """Pack the host-side per-segment inputs (transient forcing,
        feedback fields) into a pytree for the fused segment program.
        None members are static structure; changing None <-> array
        retraces once."""
        dt = self.cfg.np_dtype
        return dict(
            co2ccn=jnp.asarray(self.co2ccn, dt),
            anthro=jnp.asarray(self.anthro, dt),
            dc14ccn=jnp.asarray(self.dc14ccn, dt),
            relyr=jnp.asarray(self.relyr, dt),
            solar_scale=jnp.asarray(self.solar_scale, dt),
            sulph=self.sulph,
            cfcccn=(None if self.cfcccn is None else
                    tuple(jnp.asarray(v, dt) for v in self.cfcccn)),
            landice=self.landice,
            awind_clim=(self.awind.t_clim
                        if self.awind is not None else None),
        )

    def run_segment(self, state: CoupledState) -> CoupledState:
        """One coupled segment as ONE device program (the reference's
        segment of atm/ice substeps + land + sed + ocean substeps runs
        as a single jitted computation; the per-substep host dispatch
        and the `int(itt)` device->host syncs of the naive loop are
        gone — UVic_ESCM.F:296-416 segment semantics, lax.scan'd)."""
        if self._segment_jit is None:
            self._segment_jit = jax.jit(self._segment_core)
        state, diag = self._segment_jit(state, self._segment_scalars())
        self.last_acc = diag["acc"]
        # per-step time means for the tavg stream (tracer.F:420-443
        # in-step accumulation fidelity; Run consumes these instead of
        # per-segment snapshots)
        self.last_tavg = {**diag["tavg_ocean"], **diag["tavg_atm"],
                          **diag.get("tavg_land", {})}
        if "nep" in diag:
            self.last_nep_kgC_s = diag["nep"]
        return state

    def _segment_core(self, state: CoupledState, sc: dict):
        diag = {}
        sst, sss, frzpt = self.gasbc(state)
        # surface geostrophic currents for ice drag: ocean surface vel
        u_surf = self.ocean.full_velocity(state.ocean.u, state.ocean.psi0)
        uocn, vocn = u_surf[0, 0], u_surf[1, 0]

        atm, ice = state.atm, state.ice

        # anomalous wind feedback (winds.F): SAT anomaly vs climatology
        # perturbs advecting winds, stress, and wind speed per segment
        wind_pkg = None
        if sc["awind_clim"] is not None:
            w2, tx2, ty2, ws2 = self.awind.apply(
                atm.at[0], self.embm.winds, self.taux_w, self.tauy_w,
                self.embm.wspd, t_clim=sc["awind_clim"])
            wind_pkg = (w2, ws2, tx2, ty2)

        # seasonal insolation at the segment midpoint (setembm/zenith),
        # scaled by the transient solar-volcanic factor (solardata.F /
        # volcdata.F application in fluxes.F solins)
        if self.cfg.embm.seasonal:
            from ..models.embm.insolation import daily_insolation
            yrlen = 360.0 if self.cfg.time.eqyear else 365.0
            day = (sc["relyr"] % 1.0) * yrlen \
                + 0.5 * self.cfg.time.segtim_days
            solins = daily_insolation(self.tlat_rad2d, day, yrlen)
        else:
            solins = self.embm.solins
        solins = solins * sc["solar_scale"]

        # land->atm feedback: canopy conductance from the previous land
        # physics step enters every atm substep (glsbc.F cadence)
        land_gc = None
        if state.land is not None and state.land.gc is not None:
            land_gc = state.land.gc * 100.0   # m/s -> cm/s

        # ---- atm/ice substeps as one scan (embm.F:39-95) -------------
        z2 = jnp.zeros_like(sst)
        acc0 = dict(heat=z2, freshwater=z2, taux=z2, tauy=z2, swr=z2,
                    wspd=z2, toa_sw=z2, olr=z2, precip=z2, psno=z2,
                    evap=z2, runoff=z2, uplwr=z2, upsens=z2, upltnt=z2,
                    time=jnp.zeros((), sst.dtype))
        if self.cfg.ocean.convect_brine and self.cfg.ice.enabled:
            acc0["cbf"] = jnp.zeros((2,) + sst.shape, sst.dtype)
            acc0["cba"] = jnp.zeros((2,) + sst.shape, sst.dtype)
        # per-substep tavg accumulation (the reference accumulates
        # inside the step, embm_tavg; per-segment sampling aliases)
        atav0 = dict(sat=z2, shum=z2, hice=z2, aice=z2, hsno=z2,
                     soilm=z2, tice=z2, uice=z2, vice=z2)

        def atm_body(carry, _):
            atm_c, ice_c, cpts_c, acc_c, tav_c = carry
            mixing = atm_c.nats + 1 > self.cfg.embm.namix
            atm_n, ice_n, a, cpts_n = self._atm_ice_step_impl(
                atm_c, ice_c, sst, frzpt, uocn, vocn, sc["anthro"],
                wind_pkg, solins, cpts_c, land_gc, sc["sulph"],
                sc["landice"], mixing=mixing)
            acc_n = {k: acc_c[k] + a[k] for k in acc_c}
            tav_n = dict(sat=tav_c["sat"] + atm_n.at[0],
                         shum=tav_c["shum"] + atm_n.at[1],
                         hice=tav_c["hice"] + ice_n.hice,
                         aice=tav_c["aice"] + ice_n.aice,
                         hsno=tav_c["hsno"] + ice_n.hsno,
                         soilm=tav_c["soilm"] + atm_n.soilm,
                         tice=tav_c["tice"] + ice_n.tice,
                         uice=tav_c["uice"] + ice_n.uice[0],
                         vice=tav_c["vice"] + ice_n.uice[1])
            return (atm_n, ice_n, cpts_n, acc_n, tav_n), None

        (atm, ice, cpts_st, acc, atav), _ = jax.lax.scan(
            atm_body, (atm, ice, state.cpts, acc0, atav0), None,
            length=self.ntspas)
        tavg_a = {k: v / self.ntspas for k, v in atav.items()}
        # flux-bus means (embm_tavg.F catalog: precip, evap, runoff,
        # OLR, absorbed SW, surface turbulent/longwave fluxes)
        at_n = acc["time"]
        for nm in ("precip", "evap", "runoff", "olr", "swr", "uplwr",
                   "upsens", "upltnt", "psno", "wspd", "toa_sw"):
            tavg_a[nm] = acc[nm] / at_n
        # soilm/tice accumulate in the scan like every other row of the
        # embm_tavg.F catalog (ADVICE r4: they were end-of-segment
        # snapshots published in the time-mean stream)
        diag["tavg_atm"] = tavg_a

        swr_mean = acc["swr"] / acc["time"]
        # segment flux totals for the conservation audit (global_sums.F
        # closure checks) and diagnostics
        diag["acc"] = acc

        # ---- land model segment update (mtlm.F; glsbc coupling) -------
        land = state.land
        if land is not None:
            from ..models.land.mtlm import mtlm_physics_step, triffid_update
            rh_mean = jnp.clip(atm.at[1] / (3.8011e-3 * jnp.exp(
                17.67 * atm.at[0] / (atm.at[0] + 243.5))), 0.0, 1.0)
            # acc["time"] is the leapfrog-weighted interval sum (the
            # sum_flux normalizer); the prognostic update integrates
            # over the PHYSICAL segment duration
            seg_phys = self.cfg.time.segtim_days * 86400.0
            land, lflux = mtlm_physics_step(
                land, self.embm.lmsk, atm.at[0], atm.at[1], swr_mean,
                rh_mean, atm.soilm / 15.0, co2_ppm=sc["co2ccn"],
                # hydrology forcing (mtlm_state.F/penmon.F): segment
                # means, cgs -> SI (g/cm^2/s -> kg/m^2/s, cm/s -> m/s)
                precip=acc["precip"] / acc["time"] * 10.0,
                psno=acc["psno"] / acc["time"] * 10.0,
                wspd=acc["wspd"] / acc["time"] * 0.01,
                dt=seg_phys)
            # land carbon flux into the global CO2 budget (gasbc.F
            # O_carbon): per-segment diagnostic, applied by `run`
            # when carbon_co2 is interactive
            diag["nep"] = jnp.sum(lflux["nep"]
                                  * self.area2d_land) * 1.0e-4
            # TRIFFID every segment: gamma = 360d / segment days
            gamma = 360.0 / self.cfg.time.segtim_days
            land, _ = triffid_update(land, self.embm.lmsk, gamma)
            # land tavg rows (mtlm_tavg.F catalog)
            diag["tavg_land"] = dict(
                m_soil=land.m_soil, lying_snow=land.lying_snow,
                tsoil=land.tsoil, cs=land.cs,
                veg_frac=jnp.sum(land.frac[:5], axis=0),
                nep=lflux["nep"])

        state = CoupledState(ocean=state.ocean, atm=atm, ice=ice,
                             land=land, sed=state.sed, cpts=cpts_st)

        # ---- sediment step (sed.F, per dtsed ~ segment) ---------------
        # runs BEFORE gosbc so the dissolution return flux enters this
        # segment's bottom-cell tracer forcing (tracer.F sed block)
        sed = state.sed
        sfl = None
        if sed is not None and "dic" in self.ocean.tracer_index:
            idx = self.ocean.tracer_index
            kb = jnp.maximum(self.ocean.kmt - 1, 0)
            bt = jnp.take_along_axis(
                state.ocean.t, kb[None, None], axis=1)[:, 0]
            sss_b = bt[1] * 1000.0 + 35.0
            depth = jnp.asarray(self.topo.ht)
            seg_s = self.cfg.time.segtim_days * 86400.0
            from ..models.sed.porewater import PoreWaterState
            if isinstance(sed, PoreWaterState):
                # Archer pore-water diagenesis columns.  Coupling uses
                # the reference's burial-correction semantics (sed.F:
                # 283-300): the water column keeps the instant bottom
                # redeposit of the particle rain (mobi/npzd bottom
                # source), and the sediment returns the CORRECTION
                # (dissolution+respiration - rain), normally negative
                # (net burial), as a bottom dic/alk flux.
                from ..models.sed.porewater import porewater_step
                mob = self.ocean.npzd[True] if self.ocean.npzd else None
                z2 = jnp.zeros_like(bt[0])
                rain_cal = z2
                rain_org = z2
                if mob is not None and "caco3" in idx:
                    wc_b = jnp.take(mob.wc * mob.dzt, kb)
                    rain_cal = bt[idx["caco3"]] * wc_b * 1.0e-9
                if mob is not None and "detr" in idx:
                    wd_b = jnp.take(mob.wd * mob.dzt, kb)
                    redctn = getattr(mob, "redctn", 7.1e-3)
                    rain_org = bt[idx["detr"]] * wd_b * 1.0e-6 * redctn
                o2_bw = (bt[idx.io2] * 1e-3 if "o2" in idx
                         else z2 + 1.5e-4)
                alk_bw = (bt[idx.ialk] * 1e-3 if "alk" in idx
                          else 2.37e-3 + z2)
                sed, pw = porewater_step(
                    sed, jnp.clip(bt[0], -2, 35),
                    jnp.clip(sss_b, 0, 45), alk_bw,
                    bt[idx.idic] * 1e-3, o2_bw, rain_cal, rain_org,
                    depth * 1e-2, self.embm.tmsk, seg_s)
                per_s = 1.0e6 / 3.15e7    # mol/cm^2/yr -> umol/cm^2/s
                corr_cal = (pw["ttrcal"]
                            - rain_cal * 3.15e7) * per_s
                corr_org = (pw["ttrorg"]
                            - rain_org * 3.15e7) * per_s
                sfl = dict(dic=(corr_cal + corr_org) * self.embm.tmsk,
                           alk=2.0 * corr_cal * self.embm.tmsk)
            else:
                from ..models.bgc.gasx import co2calc_sws
                from ..models.sed.sediment import sed_step
                carb = co2calc_sws(jnp.clip(bt[0], -2, 35),
                                   jnp.clip(sss_b, 0, 45),
                                   bt[idx.idic],
                                   bt[idx.ialk] if "alk" in idx
                                   else 2.37 * jnp.ones_like(bt[0]),
                                   sc["co2ccn"])
                sed, sfl = sed_step(sed, carb["co3"] * 1e-3, depth,
                                    self.embm.tmsk, seg_s)
            state = state.replace(sed=sed)

        forcing = self.gosbc(acc, state, sst, sss, swr_mean, sed_flux=sfl,
                             co2ccn=sc["co2ccn"], cfcccn=sc["cfcccn"],
                             dc14ccn=sc["dc14ccn"], relyr=sc["relyr"])

        # ---- ocean substeps as one scan (mom.F leapfrog control) ------
        nmix = self.cfg.ocean.nmix
        g = self.ocean.g
        z3 = jnp.zeros_like(state.ocean.t[0])
        otav0 = dict(
            temp=z3, salt=z3, u=z3, v=z3, w=z3, rho=z3,
            adv_fe_temp=z3, adv_fn_temp=z3, adv_fb_temp=z3,
            dif_fe_temp=z3, dif_fn_temp=z3, dif_fb_temp=z3,
            psi=jnp.zeros_like(state.ocean.psi0))
        if self.ocean.nt > 2:
            otav0["surf_tracers"] = jnp.zeros_like(state.ocean.t[:, 0])

        def ocean_body(carry, _):
            oc, tav_c = carry
            lf = (oc.itt % nmix) != 0
            oc = self.ocean._step(oc, forcing, leapfrog=lf)
            # per-step tavg accumulation (tracer.F:420-443 / the
            # mom_tavg.F catalog: T S u v w rho psi + surface tracers)
            uf = self.ocean.full_velocity(oc.u, oc.psi0)
            from ..models.ocean.kernels import adv_vel
            from ..models.ocean.model import eos_state_from
            from ..ops.stencil import DN, E, N
            vet, vnt, vbt, *_ = adv_vel(uf[0], uf[1], self.ocean.g,
                                        self.ocean.cyclic)
            rho = eos_state_from(self.ocean.eos_c, self.ocean.eos_to,
                                 self.ocean.eos_so, oc.t)
            # per-face advective + diffusive TEMPERATURE fluxes
            # (mom_tavg.F O_save_* per-face flux rows; saved for the
            # heat tracer — the full per-tracer family would re-create
            # the HBM cascade the fused kernel removed)
            og = self.ocean.g
            tT = oc.t[0]
            adv_fe = vet * (tT + E(tT))
            adv_fn = vnt * (tT + N(tT))
            adv_fb = vbt * (tT + DN(tT))
            dif_fe = self.cfg.ocean.ah * og.cstdxur[None] * (E(tT) - tT)
            dif_fn = (self.cfg.ocean.ah
                      * (og.csu * og.dyur)[None, :, None]
                      * (N(tT) - tT))
            dif_fb = self.ocean.diff_cbt * og.dzwr[1:][:, None, None] \
                * (tT - DN(tT))
            tav_n = dict(temp=tav_c["temp"] + oc.t[0],
                         salt=tav_c["salt"] + oc.t[1],
                         u=tav_c["u"] + uf[0], v=tav_c["v"] + uf[1],
                         w=tav_c["w"] + vbt,
                         rho=tav_c["rho"] + rho,
                         adv_fe_temp=tav_c["adv_fe_temp"] + adv_fe,
                         adv_fn_temp=tav_c["adv_fn_temp"] + adv_fn,
                         adv_fb_temp=tav_c["adv_fb_temp"] + adv_fb,
                         dif_fe_temp=tav_c["dif_fe_temp"] + dif_fe,
                         dif_fn_temp=tav_c["dif_fn_temp"] + dif_fn,
                         dif_fb_temp=tav_c["dif_fb_temp"] + dif_fb,
                         psi=tav_c["psi"] + oc.psi0)
            if "surf_tracers" in tav_c:
                tav_n["surf_tracers"] = tav_c["surf_tracers"] \
                    + oc.t[:, 0]
            return (oc, tav_n), None

        (ocean, otav), _ = jax.lax.scan(
            ocean_body, (state.ocean, otav0), None, length=self.ntspos)
        tavg_o = {k: v / self.ntspos for k, v in otav.items()
                  if k != "surf_tracers"}
        tavg_o["salt"] = tavg_o["salt"] * 1000.0 + 35.0
        if "surf_tracers" in otav:
            names = [tr.name for tr in self.ocean.tracer_index.tracers]
            surf = otav["surf_tracers"] / self.ntspos
            for n_i, nm in enumerate(names[2:], start=2):
                tavg_o["surf_" + nm] = surf[n_i]
        # surface forcing means (mom_tavg.F stf/smf rows): heat/salt
        # flux as applied, momentum flux, shortwave
        at = acc["time"]
        tavg_o["hflx"] = 2.389e-8 * acc["heat"] / at * self.embm.tmsk
        tavg_o["sflx"] = -SOCN * acc["freshwater"] / at * self.embm.tmsk
        tavg_o["taux"] = acc["taux"] / at / 1.035
        tavg_o["tauy"] = acc["tauy"] / at / 1.035
        # GM eddy-induced (bolus) velocities for the residual
        # overturning diagnostic (mom_tavg.F O_gm_diag rows; the
        # reference's diago.F overturning includes adv_v*tiso).  One
        # compute_isopyc per segment on the end-of-segment tracers —
        # diagnostic-only, ~0.4 ms vs the ~250 ms segment.
        if self.cfg.ocean.isopycmix and self.cfg.ocean.gent_mcwilliams:
            from ..models.ocean.isopyc import compute_isopyc
            om = self.ocean
            iso_d = compute_isopyc(ocean.t, om.tmask, om.kmt, om.eos_c,
                                   om.eos_to, om.eos_so, om.g,
                                   self.cfg.ocean, om.cyclic,
                                   addisop=om.addisop)
            tavg_o["vetiso"] = iso_d.vetiso
            tavg_o["vntiso"] = iso_d.vntiso
            tavg_o["wbtiso"] = iso_d.vbtiso
            # effective vertical tracer diffusivity incl. the
            # isopycnal K33 (mom_tavg.F vdiff-coefficient row; the
            # tidal/PP additions are applied in-step and noted as
            # excluded in diag/stability.py)
            tavg_o["diff_cbt_eff"] = self.ocean.diff_cbt + iso_d.K33
        # convective-adjustment extent (O_save_convection analog):
        # surface-connected mixed depth + stable-region count from the
        # end-of-segment profile
        if self.cfg.ocean.convection == "full":
            from ..ops.convection import convection_extent
            cdep, cnreg = convection_extent(
                ocean.t, self.ocean.kmt, self.ocean.eos_c,
                self.ocean.eos_to, self.ocean.eos_so,
                self.ocean.dztxcl, jnp.asarray(self.ocean.g.dzt))
            tavg_o["convect_depth"] = cdep
            tavg_o["convect_nreg"] = cnreg.astype(cdep.dtype)
        diag["tavg_ocean"] = tavg_o
        return CoupledState(ocean=ocean, atm=atm, ice=ice, land=land,
                            sed=state.sed, cpts=cpts_st), diag

    def set_transient_forcing(self, transient=None):
        """Enable transient forcing (co2data/solardata/... readers)."""
        from ..io.forcing import TransientForcing
        self.transient = transient or TransientForcing.default()

    def run(self, state: CoupledState, nseg: int) -> CoupledState:
        seg_days = self.cfg.time.segtim_days
        yrlen = 360.0 if self.cfg.time.eqyear else 365.0
        from ..models.embm.constants import SOLARCONST
        for _ in range(nseg):
            if self.transient is not None:
                f = self.transient.at(self.year0 + self.relyr)
                self.co2ccn = f["co2ccn"]
                self.anthro = 5.35e3 * np.log(self.co2ccn / 280.0)
                self.dc14ccn = f["dc14ccn"]
                self.solar_scale = f["solarconst"] / SOLARCONST
                if "aggfor" in f:
                    # additional GHG radiative forcing rides the same
                    # longwave channel as CO2 (aggdata.F application
                    # in fluxes.F anthro)
                    self.anthro = self.anthro + f["aggfor"]
                if "sealev" in f:
                    self.sealev = f["sealev"]
                if "icesheet" in f and f["icesheet"] \
                        != self._icesheet_scale:
                    # paleo continental ice sheets (icedata.F): rebuild
                    # the authored footprint at the new extent scale
                    self._icesheet_scale = f["icesheet"]
                    if f["icesheet"] > 0.0:
                        from ..core.earth import landice_fields
                        ai, hi = landice_fields(self.grid,
                                                f["icesheet"])
                        dt = self.cfg.np_dtype
                        self.landice = (jnp.asarray(hi, dt),
                                        jnp.asarray(ai, dt))
                    else:
                        self.landice = None
                if "sulph_scale" in f:
                    self.sulph = (self._sulph_pattern * f["sulph_scale"]
                                  if f["sulph_scale"] > 0.0 else None)
                if "cfc11ccnn" in f:
                    self.cfcccn = (f["cfc11ccnn"], f["cfc11ccns"],
                                   f["cfc12ccnn"], f["cfc12ccns"])
            state = self.run_segment(state)
            self.relyr += seg_days / yrlen
        return state
