"""EMBM: 2-D energy-moisture balance atmosphere.

TPU-native re-design of source/embm/ (Fanning & Weaver 1996):

- `fluxes`: shortwave, Thompson-Warren outgoing longwave, latent +
  sensible + longwave surface fluxes; land surface temperature by a
  fixed-iteration Newton solve (fluxes.F:2-278),
- `precipitate`: condense humidity above rhmax of saturation, snowfall
  partition, soil moisture + runoff bookkeeping (fluxes.F:280-446),
- implicit advection-diffusion transport of SAT and humidity on the
  5-point upstream/diffusion operator (solve.F + coef); the reference's
  solver zoo (ADI/multigrid/SLAP/ESSL/SPARSKIT) collapses to one
  jit-compatible BiCGSTAB with diagonal preconditioning - the operator
  is non-symmetric because of upstream advection,
- leapfrog time stepping with a forward mixing step every `namix`
  steps (embm.F:39-48).

The reference reads diffusivities, atmospheric coalbedo, winds, and
elevation from data files absent upstream; they default here to the
documented constants / parameterizations and are overridable.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from types import SimpleNamespace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ...constants import EPSLN, RADIAN
from . import constants as C
from .insolation import annual_mean_insolation


@struct.dataclass
class AtmState:
    """at = (nat, jmt, imt) atmospheric tracers [SAT degC, humidity g/g]
    at tau and tau-1; land surface fields."""
    at: jnp.ndarray
    atm1: jnp.ndarray
    soilm: jnp.ndarray     # (jmt, imt) soil moisture [cm]
    soilm1: jnp.ndarray
    surf: jnp.ndarray      # (jmt, imt) land surface temperature [C]
    nats: jnp.ndarray      # mixing counter


@struct.dataclass
class AtmDiag:
    """Per-step fields needed by the coupler (atm.h flux arrays)."""
    precip: jnp.ndarray
    psno: jnp.ndarray
    evap: jnp.ndarray
    rh: jnp.ndarray
    dnswr: jnp.ndarray
    outlwr: jnp.ndarray
    uplwr: jnp.ndarray
    upsens: jnp.ndarray
    upltnt: jnp.ndarray
    runoff: jnp.ndarray
    flux_shum: jnp.ndarray  # net freshwater flux to surface [g/cm^2/s]


class EmbmModel:
    def __init__(self, grid, topo, cfg, dtype=np.float64,
                 elev=None, winds=None, diff_n=None, diff_e=None,
                 atm_coalbedo=None, wspd=None, diff_t=None, diff_q=None,
                 dry_soil_albedo=0.0):
        self.cfg = cfg
        self.grid = grid
        self.topo = topo
        jmt, imt = grid.jmt, grid.imt
        dt = np.dtype(dtype)

        def jn(x):
            return jnp.asarray(np.asarray(x, dtype=dt))

        g = SimpleNamespace()
        # solver grid factors (setembm.F:453-480, 1-point-per-cell branch)
        csu, cst = grid.csu, grid.cst
        dyu, dyt = grid.dyu, grid.dyt
        dxu, dxt = grid.dxu, grid.dxt
        jm1 = np.maximum(np.arange(jmt) - 1, 0)
        im1 = np.maximum(np.arange(imt) - 1, 0)
        g.dsgrd = jn(csu[jm1] / (dyu[jm1] * cst * dyt))
        g.dngrd = jn(csu / (dyu * cst * dyt))
        g.asgrd = jn(csu[jm1] / (2.0 * cst * dyt))
        g.angrd = jn(csu / (2.0 * cst * dyt))
        g.dwgrd = jn(1.0 / (dxu[im1] * dxt))
        g.degrd = jn(1.0 / (dxu * dxt))
        g.azgrd = jn(1.0 / (2.0 * dxt))
        g.cstr = jn(1.0 / cst)
        g.tlat = jn(np.broadcast_to(grid.yt[:, None], (jmt, imt)))
        self.g = g

        # masks: tmsk = 1 over ocean (embm convention)
        self.tmsk = jn((topo.kmt > 0).astype(np.float64))
        self.lmsk = 1.0 - self.tmsk

        # diffusivities (setembm.F:265-266 reads per-tracer A_difft*/
        # A_diffq* fields with a flat 5e9 fallback; heat and moisture
        # carry separate fields like the reference's dn(:,:,n))
        base = np.full((jmt, imt), 5.0e9)
        self.diff_n = jn(base if diff_n is None else diff_n)
        self.diff_e = jn(base if diff_e is None else diff_e)
        self.diff_t = self.diff_n if diff_t is None else jn(diff_t)
        self.diff_q = self.diff_n if diff_q is None else jn(diff_q)

        # elevation [cm] (reads data in reference; default: sea level)
        self.elev = jn(np.zeros((jmt, imt)) if elev is None else elev)

        # winds at U cells [cm/s] (from data/feedback in reference);
        # default: analytic easterlies/westerlies profile
        if winds is None:
            lat = grid.yu
            u = 600.0 * (np.sin(np.deg2rad(3.0 * lat))
                         - 0.5 * np.sin(np.deg2rad(lat)))
            winds = np.stack([np.broadcast_to(u[:, None], (jmt, imt)),
                              np.zeros((jmt, imt))])
        self.winds = jn(winds)
        if wspd is None:
            self.wspd = jnp.sqrt(self.winds[0] ** 2
                                 + self.winds[1] ** 2) + 1.0
        else:
            self.wspd = jn(wspd)
        # dry-soil brightening: fractional reduction of the land
        # surface shortwave absorption at zero soil moisture (deserts
        # are bright; stand-in for the reference's surface-type albedo
        # data, applied in `fluxes`)
        self.dry_soil_albedo = float(dry_soil_albedo)

        # annual-mean insolation (seasonal cycle hooks in later)
        lat2d = np.deg2rad(np.broadcast_to(grid.yt[:, None], (jmt, imt)))
        self.solins = jn(np.asarray(annual_mean_insolation(lat2d)))

        # coalbedos: atmosphere (data file in reference; zonal fit here)
        # and ocean surface (setembm.F:952-959)
        if atm_coalbedo is None:
            atm_coalbedo = 0.85 - 0.13 * np.sin(
                np.deg2rad(np.broadcast_to(grid.yt[:, None],
                                           (jmt, imt)))) ** 2
        self.aca = jn(atm_coalbedo)
        sca_o = 0.87 + 0.02 * np.cos(
            2.0 * np.deg2rad(np.abs(np.broadcast_to(grid.yt[:, None],
                                                    (jmt, imt)))))
        # land surface coalbedo: temperate value dropping to ice-sheet
        # albedo poleward of ~60 deg (the reference reads this from
        # data, setembm.F:265; a uniform 0.80 bakes Antarctica in polar
        # summer until the Thompson-Warren OLR fit leaves its range)
        alat = np.abs(np.broadcast_to(grid.yt[:, None], (jmt, imt)))
        sca_l = 0.80 - 0.55 / (1.0 + np.exp(-(alat - 63.0) / 4.0))
        self.sca = jn(np.where(topo.kmt > 0, sca_o, sca_l))

        self.anthro = 0.0   # CO2 radiative forcing (co2forc)
        self.dtype = dt
        self.cyclic = grid.cyclic
        # dtype-aware solver tolerance: the configured 1e-10 relative
        # residual is unreachable in f32 (eps ~ 1.2e-7), so every
        # transport solve would spin to maxiter; clamp to ~30 eps
        self.solver_tol = max(cfg.solver_tol,
                              30.0 * float(np.finfo(dt).eps))

        self._step = jax.jit(self._step_impl, static_argnames=("mixing",))

    # ------------------------------------------------------------------
    def init_state(self, sat0=None, shum0=None) -> AtmState:
        jmt, imt = self.grid.jmt, self.grid.imt
        lat = np.broadcast_to(self.grid.yt[:, None], (jmt, imt))
        if sat0 is None:
            sat0 = 25.0 * np.cos(np.deg2rad(lat)) ** 2 - 2.0
        if shum0 is None:
            shum0 = 0.8 * C.CSSH * np.exp(
                17.67 * sat0 / (np.maximum(sat0, -40.0) + 243.5))
        at = jnp.asarray(np.stack([sat0, shum0]), dtype=self.dtype)
        z = jnp.zeros((jmt, imt), dtype=self.dtype)
        return AtmState(at=at, atm1=at + 0.0,
                        soilm=z + 0.5 * C.SOILMAX,
                        soilm1=z + 0.5 * C.SOILMAX,
                        surf=at[0] + 0.0,
                        nats=jnp.zeros((), jnp.int32))

    def _bc(self, a):
        if self.cyclic:
            return a.at[..., 0].set(a[..., -2]).at[..., -1].set(a[..., 1])
        return a

    # ------------------------------------------------------------------
    def fluxes(self, state: AtmState, sst, aice=None, dts=54000.0,
               anthro=0.0, wspd=None, solins=None, land_gc=None,
               sulph=None, hicel=None, aicel=None):
        """Surface/TOA fluxes at tau (fluxes.F:2-278). sst: (jmt, imt).
        ``anthro``: CO2 radiative forcing [erg/cm^2/s] (co2forc).
        ``wspd``: overrides the prescribed wind speed (awind feedback).
        ``land_gc``: MTLM aggregate canopy conductance [cm/s] — when
        given, the land surface solve uses the vegetation's stomatal
        resistance instead of the fixed 150 s/cm (the land->atmosphere
        feedback of glsbc.F/fluxes.F O_mtlm: evap, sensible and longwave
        all respond through the Newton energy balance).
        ``sulph``: anthropogenic sulphate optical-depth field reducing
        the surface coalbedo (fluxes.F:101 O_sulphate_data:
        dnswr = solins*aca*pass*max(0, sca - sulph)).
        ``hicel``/``aicel``: paleo continental ice-sheet elevation
        anomaly [cm] and 0/1 extent mask (O_landice_data, icedata.F):
        elevation enters every lapse-rate term (fluxes.F:112,344) and
        ice-covered land takes the ice-sheet coalbedo."""
        at_sat = state.at[0]
        at_shum = state.at[1]
        telev = self.elev if hicel is None else self.elev + hicel
        teff = at_sat - telev * C.RLAPSE * C.RF1 * jnp.exp(
            jnp.maximum(-1.0, -telev / C.RF2))
        tair = at_sat - telev * C.RLAPSE

        # saturation humidity over water; rh from last precipitate pass
        ssh_eff = C.CSSH * jnp.exp(17.67 * teff / (teff + 243.5))
        rh = jnp.clip(at_shum / (ssh_eff + EPSLN), 0.0, 1.0)

        if solins is None:
            solins = self.solins
        sca = self.sca if sulph is None \
            else jnp.maximum(0.0, self.sca - sulph)
        if aicel is not None:
            sca = jnp.where(aicel * self.lmsk > 0.5, 0.25, sca)
        dnswr = solins * self.aca * C.PASS * sca
        if self.dry_soil_albedo > 0.0:
            # dry land is brighter (desert albedo); scales the land
            # surface absorption by soil-moisture deficit
            dry = 1.0 - jnp.clip(state.soilm / C.SOILMAX, 0.0, 1.0)
            dnswr = dnswr * (1.0 - self.dry_soil_albedo * dry
                             * self.lmsk)

        b = C.TW_B
        # Thompson-Warren OLR is a cubic FIT valid for moderate teff;
        # evaluated far outside its range the cubic bends downward
        # (less OLR when warmer -> radiative runaway).  Clamp the
        # polynomial argument and continue linearly with a blackbody
        # slope (~4 sigma T^3 ~ 5e3 erg/cm^2/s/K) beyond it.
        teff_c = jnp.clip(teff, -60.0, 45.0)
        outlwr = 1.0e3 * (
            b["b00"] + b["b10"] * rh + b["b20"] * rh ** 2
            + (b["b01"] + b["b11"] * rh + b["b21"] * rh ** 2) * teff_c
            + (b["b02"] + b["b12"] * rh + b["b22"] * rh ** 2)
            * teff_c ** 2
            + (b["b03"] + b["b13"] * rh + b["b23"] * rh ** 2)
            * teff_c ** 3
        ) + 5.0e3 * (teff - teff_c) - anthro

        fb = 0.94 * C.RHOATM * C.CPATM
        if wspd is None:
            wspd = self.wspd

        # ---- ocean points --------------------------------------------
        fg_o = C.DALT_O * wspd
        ssh_o = C.CSSH * jnp.exp(17.67 * sst / (sst + 243.5))
        evap_o = jnp.maximum(0.0, C.RHOATM * fg_o * (ssh_o - at_shum))
        upsens_o = fb * fg_o * (sst - tair)
        uplwr_o = (C.ESOCN * (sst + C.C2K) ** 4
                   - C.ESATM * (tair + C.C2K) ** 4)

        # ---- land points: Newton solve for surface temperature -------
        fm = C.ESATM * (tair + C.C2K) ** 4
        if land_gc is None:
            rs_stom = 150.0                            # fixed veg_rs [s/cm]
        else:
            rs_stom = jnp.where(land_gc > 1.0e-8, 1.0 / (land_gc + EPSLN),
                                150.0)
            rs_stom = jnp.clip(rs_stom, 20.0, 2.0e4)
        sr = 1.0 / (C.DALT_V * wspd + EPSLN) + rs_stom  # stomatal+aero [s/cm]
        fh = jnp.clip((state.soilm / C.SOILMAX) ** 0.25, EPSLN, 1.0)
        fl = fh * C.RHOATM * C.VLOCN / sr
        fg_l = fh * C.RHOATM / sr
        dusens = fb * C.DALT_V * wspd
        qair = rh * C.CSSH * jnp.exp(17.67 * tair / (tair + 243.5))

        def newton(i, tlnd):
            qlnd = C.CSSH * jnp.exp(17.67 * tlnd / (tlnd + 243.5))
            wet = qlnd > qair
            ultnt = jnp.where(wet, fl * (qlnd - qair), 0.0)
            dultnt = jnp.where(
                wet, fl * qlnd * 17.67 * 243.5 / (tlnd + 243.5) ** 2, 0.0)
            usens = dusens * (tlnd - tair)
            ulwr = C.ESLND * (tlnd + C.C2K) ** 4 - fm
            dulwr = 4.0 * C.ESLND * (tlnd + C.C2K) ** 3
            f = dnswr - ultnt - usens - ulwr
            df = dultnt + dusens + dulwr
            return tlnd + f / df

        tlnd = jax.lax.fori_loop(0, 10, newton, state.surf)
        qlnd = C.CSSH * jnp.exp(17.67 * tlnd / (tlnd + 243.5))
        evap_l = jnp.maximum(0.0, fg_l * (qlnd - qair))
        evap_l = jnp.minimum(evap_l, state.soilm / dts)
        upltnt_l = C.VLOCN * evap_l
        uplwr_l = C.ESLND * (tlnd + C.C2K) ** 4 - fm
        # balance land budget: land cannot store the residual
        upsens_l = dnswr - upltnt_l - uplwr_l

        ocean = self.tmsk
        evap = ocean * evap_o + (1 - ocean) * evap_l
        upsens = ocean * upsens_o + (1 - ocean) * upsens_l
        uplwr = ocean * uplwr_o + (1 - ocean) * uplwr_l
        upltnt = C.VLOCN * evap_o * ocean + upltnt_l * (1 - ocean)
        surf_new = jnp.where(ocean > 0, state.surf, tlnd)

        return dict(dnswr=dnswr, outlwr=outlwr, evap=evap, rh=rh,
                    upsens=upsens, uplwr=uplwr, upltnt=upltnt,
                    surf=surf_new, tair=tair, teff=teff)

    # ------------------------------------------------------------------
    def _transport_matvec(self, x, coefs):
        cc, cn, cs, ce, cw = coefs
        xb = self._bc(x)
        y = (cc * xb
             + cn * jnp.roll(xb, -1, axis=0) + cs * jnp.roll(xb, 1, axis=0)
             + ce * jnp.roll(xb, -1, axis=1) + cw * jnp.roll(xb, 1, axis=1))
        # boundary rows/columns are identity equations (the duplicated
        # cyclic columns are reinstalled by _bc after the solve)
        y = y.at[0, :].set(x[0, :]).at[-1, :].set(x[-1, :])
        y = y.at[:, 0].set(x[:, 0]).at[:, -1].set(x[:, -1])
        return y

    def _coef(self, diff, dts, winds=None):
        """Implicit operator coefficients (solve.F coef:424-620).
        ``winds`` overrides the prescribed advecting winds (awind)."""
        g = self.g
        jmt = self.grid.jmt
        j = jnp.arange(jmt)
        # active rows are 1..jmt-2 (solve.F interior j=2..jmt-1 in
        # 1-based Fortran), symmetric with the j==1 / j==jmt-2 face-flux
        # zeroing below.  Excluding row 1 here (as before round 5) froze
        # the first physical row while row 2 still fluxed into it — a
        # one-sided boundary leak that destroyed ~2.2 W/m^2 of global
        # atmospheric heat (found by the areaT A = areaT adjoint test,
        # tests/test_embm.py::test_transport_operator_conserves).
        interior_j = (j > 0) & (j < jmt - 1)

        dn_s = jnp.roll(diff, 1, axis=0)      # dn(i,j-1)
        cs0 = jnp.where((j == 1)[:, None], 0.0, dn_s)
        cn0 = jnp.where((j == jmt - 2)[:, None], 0.0, diff)
        cs = -dts * cs0 * g.dsgrd[:, None]
        cn = -dts * cn0 * g.dngrd[:, None]
        de_w = jnp.roll(diff, 1, axis=1)
        cw = -dts * de_w * g.cstr[:, None] ** 2 * g.dwgrd[None, :]
        ce = -dts * diff * g.cstr[:, None] ** 2 * g.degrd[None, :]
        cc = 1.0 - cs - cn - cw - ce

        # upstream advection from the prescribed wind field at U cells
        if winds is None:
            winds = self.winds
        wx, wy = winds[0], winds[1]
        vs = jnp.roll(wy, (1, 1), axis=(0, 1)) + jnp.roll(wy, 1, axis=0)
        vn = jnp.roll(wy, 1, axis=1) + wy
        uw = jnp.roll(wx, (1, 1), axis=(0, 1)) + jnp.roll(wx, 1, axis=1)
        ue = jnp.roll(wx, 1, axis=0) + wx
        vs = jnp.where((j == 1)[:, None], 0.0, vs)
        vn = jnp.where((j == jmt - 2)[:, None], 0.0, vn)
        fs = 0.5 * (1.0 + jnp.sign(vs))
        fn = 0.5 * (1.0 + jnp.sign(vn))
        fw = 0.5 * (1.0 + jnp.sign(uw))
        fe = 0.5 * (1.0 + jnp.sign(ue))
        cs = cs - dts * fs * vs * g.asgrd[:, None]
        cn = cn + dts * (1.0 - fn) * vn * g.angrd[:, None]
        cw = cw - dts * fw * uw * g.cstr[:, None] * g.azgrd[None, :]
        ce = ce + dts * (1.0 - fe) * ue * g.cstr[:, None] * g.azgrd[None, :]
        cc = cc + dts * (fn * vn * g.angrd[:, None]
                         - (1.0 - fs) * vs * g.asgrd[:, None]
                         + (fe * ue - (1.0 - fw) * uw)
                         * g.cstr[:, None] * g.azgrd[None, :])

        mask = interior_j[:, None].astype(cc.dtype)
        one = jnp.ones_like(cc)
        cc = jnp.where(mask > 0, cc, one)
        cn = cn * mask
        cs = cs * mask
        ce = ce * mask
        cw = cw * mask
        return cc, cn, cs, ce, cw

    def solve_tracer(self, rhs, guess, coefs, tol, maxiter):
        """BiCGSTAB on the ROW-EQUILIBRATED 5-point transport operator.

        Uses the breakdown-guarded solver (ops/solvers.bicgstab_safe):
        jax.scipy's bicgstab divides by rho/omega unguarded, and on
        TPU a flushed-to-zero f32 dot product mid-iteration poisons
        the whole fused coupled-segment program with NaNs.

        Row equilibration (solve D^-1 A x = D^-1 b with D = diag(A)):
        near the poles the 1/cos^2 metric makes cc ~ 4e3 while midlat
        rows are ~1, so an unweighted residual norm lets the solver
        "converge" with O(1) equation errors at the polar rows — in f32
        that drove a runaway polar cooling once row 1 became an active
        equation (round-5 conservation fix).  Scaling every equation by
        its diagonal makes the stopping criterion uniform across rows;
        the operator itself is unchanged."""
        from ...ops.solvers import bicgstab_safe
        cc, cn, cs, ce, cw = coefs
        d = 1.0 / cc
        sc = (jnp.ones_like(cc), cn * d, cs * d, ce * d, cw * d)
        mv = partial(self._transport_matvec, coefs=sc)
        M = lambda r: r
        rhs = (rhs * d).at[:, 0].set(0.0).at[:, -1].set(0.0)
        guess = guess.at[:, 0].set(0.0).at[:, -1].set(0.0)
        x = bicgstab_safe(mv, rhs, guess, M, tol, maxiter)
        return self._bc(x)

    # ------------------------------------------------------------------
    def precipitate(self, at_shum, state, flux_shum, psno_allowed, dts,
                    hicel=None):
        """Condensation above rhmax + snow/soil bookkeeping
        (fluxes.F:280-446). Returns updated humidity and fields."""
        at_sat = state.at[0]
        telev = self.elev if hicel is None else self.elev + hicel
        teff = at_sat - telev * C.RLAPSE * C.RF1 * jnp.exp(
            jnp.maximum(-1.0, -telev / C.RF2))
        ssh = C.CSSH * jnp.exp(17.67 * teff / (teff + 243.5))
        qmax = C.RHMAX * ssh
        fb = C.RHOATM * C.SHQ / dts
        excess = jnp.maximum(0.0, at_shum - qmax)
        precip = fb * excess
        at_shum = at_shum - excess
        rh = jnp.clip(at_shum / (ssh + EPSLN), 0.0, 1.0)

        # snowfall where air temperature below freezing
        tair = at_sat - C.TSNO - telev * C.RLAPSE
        psno = jnp.where(tair <= 0.0, precip, 0.0) * psno_allowed

        # land: update soil moisture, spill to runoff
        land = self.lmsk
        fshum_land = flux_shum - precip + psno
        soilm_new = jnp.maximum(0.0, state.soilm - dts * fshum_land)
        runoff = jnp.maximum(0.0, soilm_new - C.SOILMAX) / dts
        soilm_new = jnp.minimum(soilm_new, C.SOILMAX)
        soilm_new = land * soilm_new + (1 - land) * state.soilm
        return (self._bc(at_shum), precip, psno, rh, soilm_new, runoff)

    # ------------------------------------------------------------------
    def _step_impl(self, state: AtmState, sst, *, mixing: bool):
        cfg = self.cfg
        dts = cfg.dtatm if mixing else 2.0 * cfg.dtatm
        at_old = state.at if mixing else state.atm1

        fl = self.fluxes(state, sst, dts=dts)
        evap, dnswr, outlwr = fl["evap"], fl["dnswr"], fl["outlwr"]
        uplwr, upsens, upltnt = fl["uplwr"], fl["upsens"], fl["upltnt"]

        # ---- humidity transport (solve(ishum)) -----------------------
        fa_q = dts / (C.RHOATM * C.SHQ)
        forc_q = fa_q * evap
        forc_q = forc_q.at[0, :].set(0.0).at[-1, :].set(0.0)
        coefs_q = self._coef(self.diff_q, dts)
        rhs_q = self._bc(at_old[1] + forc_q)
        shum_new = self.solve_tracer(rhs_q, state.at[1], coefs_q,
                                     self.solver_tol, cfg.solver_maxiter)

        # ---- precipitation -------------------------------------------
        flux_shum = evap * self.lmsk   # land freshwater bookkeeping
        shum_new, precip, psno, rh, soilm_new, runoff = self.precipitate(
            shum_new, state, flux_shum, jnp.ones_like(evap), dts)

        # ---- temperature transport (solve(isat)) ---------------------
        fa = dts / (C.CPATM * C.RHOATM * C.SHT)
        fb_l = dts * C.VLOCN / (C.CPATM * C.RHOATM * C.SHT)
        fc = dts * C.SLICE / (C.CPATM * C.RHOATM * C.SHT) - fb_l
        fd = C.SCATTER * (1.0 + C.PASS)
        forc_t = fa * (self.solins * self.aca * fd
                       - dnswr * C.SCATTER - outlwr
                       + uplwr + upsens)
        forc_t = forc_t + precip * fb_l + fc * psno
        forc_t = forc_t.at[0, :].set(0.0).at[-1, :].set(0.0)
        rhs_t = self._bc(at_old[0] + forc_t)
        coefs_t = self._coef(self.diff_t, dts)
        sat_new = self.solve_tracer(rhs_t, state.at[0], coefs_t,
                                    self.solver_tol, cfg.solver_maxiter)

        at_new = jnp.stack([sat_new, shum_new])
        diag = AtmDiag(precip=precip, psno=psno, evap=evap, rh=rh,
                       dnswr=dnswr, outlwr=outlwr, uplwr=uplwr,
                       upsens=upsens, upltnt=upltnt, runoff=runoff,
                       flux_shum=evap - precip)
        new_state = AtmState(
            at=at_new, atm1=state.at,
            soilm=soilm_new, soilm1=state.soilm,
            surf=fl["surf"],
            nats=jnp.where(mixing, 1, state.nats + 1),
        )
        return new_state, diag

    def step(self, state: AtmState, sst):
        mixing = bool(state.nats + 1 > self.cfg.namix)
        return self._step(state, sst, mixing=mixing)
