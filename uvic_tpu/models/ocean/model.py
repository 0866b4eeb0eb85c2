"""Ocean model: assembled leapfrog step.

TPU-native re-design of the per-timestep driver source/mom/mom.F.  The
reference sweeps a latitude memory window calling kernels row-blocks at a
time; here one jitted function computes the whole domain:

    full velocities from psi -> adv_vel -> mixing coeffs -> surface BCs
    -> tracer step -> convection -> clinic (momentum) -> barotropic CG
    -> new state

Leapfrog vs forward-mixing timesteps (mom.F:96-148) are either separate
traced variants selected by the host-side schedule, or a single trace
with data-dependent selection (the `run_scan` multi-step driver).
Euler-backward mixing (eb=.true.) runs as the two-pass
predictor/corrector of mom.F:424-446.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from types import SimpleNamespace
from typing import Any
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ...config import Convection, ModelConfig, TracerAdvection
from ...constants import GRAV, RHO0R
from ...core.state import OceanState, init_ocean_state
from ...ops.convection import convct_full, convct_ncon
from ...ops.eos import state as eos_state
from ...ops.solvers import IslandIndex
from ...ops.stencil import setbcx
from .kernels import adv_vel, clinic_step, tracer_step
from .params import OceanParams, build_ocean_params
from .tropic import ext_mode_velocity, sfc5pt_unit, tropic_step


@struct.dataclass
class SurfaceForcing:
    """Surface boundary conditions for one ocean step (csbc.h slots).

    smf : (2, jmt, imt) wind stress at U cells [dyn/cm^2 / rho0 -> cm^2/s^2]
    stf : (nt, jmt, imt) surface tracer fluxes [tracer-unit * cm/s]
    swr : (jmt, imt) downward surface shortwave [erg/cm^2/s] (bgc light)
    aice/hice/hsno : sea-ice state for light attenuation under ice
    relyr : fractional year for the seasonal declination (bgc)
    """
    smf: jnp.ndarray
    stf: jnp.ndarray
    swr: jnp.ndarray = None
    aice: jnp.ndarray = None
    hice: jnp.ndarray = None
    hsno: jnp.ndarray = None
    relyr: jnp.ndarray = None
    # bottom tracer fluxes (nt, jmt, imt), applied at the deepest wet
    # cell of each column; NEGATIVE = flux upward INTO the bottom cell
    # (sediment dissolution return, tracer.F sed bottom source)
    btf: jnp.ndarray = None
    # O_convect_brine: per-ice-category brine salt fluxes (ncat+1,j,i)
    # and area weights; injected via convct_brine instead of stf[salt]
    cbf: jnp.ndarray = None
    cba: jnp.ndarray = None


def make_forcing(smf, stf, swr=None, aice=None, hice=None, hsno=None,
                 relyr=0.0, btf=None, cbf=None, cba=None):
    """SurfaceForcing with zero-filled optional fields."""
    z = jnp.zeros_like(smf[0])
    return SurfaceForcing(
        smf=smf, stf=stf,
        swr=z + 2.0e5 if swr is None else swr,
        aice=z if aice is None else aice,
        hice=z if hice is None else hice,
        hsno=z if hsno is None else hsno,
        relyr=jnp.asarray(relyr, smf.dtype),
        btf=jnp.zeros_like(stf) if btf is None else btf,
        cbf=cbf, cba=cba,
    )


class OceanModel:
    """Holds static config + device constants and exposes jitted steps."""

    def __init__(self, params: OceanParams):
        self.params = params
        cfg = params.cfg
        self.cfg = cfg
        g = params.grid
        topo = params.topo
        dt = cfg.np_dtype

        def jn(x):
            return jnp.asarray(np.asarray(x), dtype=dt)

        # parameter bag of device constants for the kernels
        bag = SimpleNamespace()
        for name in ("dxt", "dxu", "dyt", "dyu", "dzt", "dzw", "cst", "csu",
                     "duw", "due", "dus", "dun", "dxmetr",
                     "dxtr", "dxt2r", "dxu2r", "dxu4r", "dxur",
                     "dytr", "dyt2r", "dyu2r", "dyu4r", "dyur",
                     "dztr", "dzt2r", "dzwr", "dztur", "dztlr",
                     "cstr", "csur",
                     "cstdxt2r", "cstdxtr", "cstdxur", "csudxur",
                     "csudxu2r", "cstdyt2r", "csudyu2r"):
            setattr(bag, name, jn(getattr(g, name)))
        for name in ("cori", "advmet", "amc_north", "amc_south",
                     "ahc_north", "ahc_south", "am3", "am4", "dtxcel"):
            setattr(bag, name, jn(getattr(params, name)))
        bag.ah = cfg.ocean.ah
        if getattr(cfg.ocean, "full_tensor", False):
            # O_full_tensor adds the diapycnal kappa_h to the
            # horizontal background diffusivity (hmixc.F:97-99)
            bag.ah = bag.ah + cfg.ocean.kappa_h
        bag.am = cfg.ocean.am
        bag.hr = jn(topo.hr)
        bag.h = jn(topo.h)
        self.sine = jn(g.sine)
        bag.grav_rho0r = GRAV * RHO0R
        if cfg.ocean.tracer_advection == "quicker":
            from ...ops.advection import quicker_coefficients
            qc = quicker_coefficients(g)
            bag.quicker = {ax: {k: jn(v) for k, v in d.items()}
                           for ax, d in qc.items()}
        self.g = bag

        self.tmask = jn(topo.tmask)
        self.umask = jn(topo.umask)
        self.kmt = jnp.asarray(topo.kmt, dtype=jnp.int32)
        self.kmu = jnp.asarray(topo.kmu, dtype=jnp.int32)
        self.eos_c = jn(params.eos.c)
        self.eos_to = jn(params.eos.to)
        self.eos_so = jn(params.eos.so)
        self.cyclic = g.cyclic

        # island machinery for the barotropic solve
        self.isl = IslandIndex(
            perim_id=jnp.asarray(topo.perim_id),
            nisle=topo.nisle,
            counts=jn(topo.perim_count),
            imain=topo.imain,
            ocean_mask=jn((topo.land_map <= 0).astype(np.float64)),
        )

        # barotropic mode selection (O_stream_function vs the
        # surface-pressure formulations, emode.h)
        from ...config import BarotropicMode
        self.barotropic = cfg.ocean.barotropic
        self.sp_mode = self.barotropic in (
            BarotropicMode.SURFACE_PRESSURE,
            BarotropicMode.IMPLICIT_FREE_SURFACE)
        if self.sp_mode:
            from .surfpress import spc9pt_unit
            self.cf_sp = jn(spc9pt_unit(
                np.asarray(g.dxu), np.asarray(g.dyu), np.asarray(g.csu),
                np.asarray(topo.h)))
            omask2d = (topo.land_map <= 0).astype(np.float64)
            inter = np.zeros_like(omask2d)
            inter[1:-1, 1:-1] = 1.0
            self.fs_diag_unit = jn(
                -(np.asarray(g.cst) * np.asarray(g.dyt))[:, None]
                * np.asarray(g.dxt)[None, :] / (GRAV * cfg.ocean.dtsf)
                * omask2d * inter)
            self.isl_sp = IslandIndex(
                perim_id=jnp.full((g.jmt, g.imt), -1, jnp.int32),
                nisle=0, counts=jn(np.zeros(1)), imain=-1,
                ocean_mask=jn(omask2d))
            self.sp_omask = jn(omask2d)
            # high-latitude filtering of the external-mode forcing zu:
            # the streamfunction path filters its forcing (filz,
            # tropic.F:136-141) but bardiv.F dropped uhat filtering, so
            # the sp modes have no converging-meridian protection in the
            # reference and are unstable at the standard grid/timestep;
            # filtering zu is the direct analog of filz (divergence from
            # reference, required for std-grid stability)
            if cfg.ocean.fourfil:
                from ...ops.filters import build_hlat_filter
                umask1_np = (np.asarray(topo.kmu) > 0).astype(np.float64)
                self.filt_zu = build_hlat_filter(
                    cfg.ocean.hlat_filter, umask1_np, np.asarray(g.yu),
                    g.imt, "asymmetric", g.cyclic, dt)
            else:
                self.filt_zu = None
            # alph/gam/theta time-blend constants (setmom.F:105-113)
            if self.barotropic == BarotropicMode.IMPLICIT_FREE_SURFACE:
                self.sp_consts = (1.0 / 3.0, 1.0 / 3.0, 0.5)
            else:
                self.sp_consts = (1.0, 0.0, 1.0)
            self.cf_unit = self.cf_acor = None
        else:
            # 5- or 9-point streamfunction operator at unit timestep
            from .tropic import sfc9pt_unit
            _sfc = sfc9pt_unit if cfg.ocean.sf_npt == 9 else sfc5pt_unit
            cf_unit, cf_acor = _sfc(
                np.asarray(g.dxu), np.asarray(g.dyu), np.asarray(g.csu),
                np.asarray(topo.hr),
                f=np.asarray(params.cori[0]), acor=cfg.ocean.acor)
            self.cf_unit = jn(cf_unit)
            self.cf_acor = jn(cf_acor)

        # mixing coefficients (vmixc.F:63-106); scheme selected by config
        km, jmt, imt = g.km, g.jmt, g.imt
        if cfg.ocean.vmix == "bryan_lewis":
            from .vmix import bryan_lewis_profile
            ahv = bryan_lewis_profile(np.asarray(g.zw[:km]))
            self.diff_cbt = jnp.broadcast_to(
                jn(ahv)[:, None, None], (km, jmt, imt)) + 0.0
        else:
            self.diff_cbt = jnp.full((km, jmt, imt), cfg.ocean.kappa_h,
                                     dtype=dt)
        self.visc_cbu = jnp.full((km, jmt, imt), cfg.ocean.kappa_m, dtype=dt)
        self.dztxcl = jn(g.dzt) / bag.dtxcel

        # tidal-mixing dissipation field (O_tidal_kv): the reference
        # reads constituent maps from O_tidenrg*.nc (setmom.F:130-160,
        # absent upstream); default is the documented bottom-deposit
        # placeholder, replaceable via `model.tidal_edr = ...`
        self.tidal_edr = None
        self.tlat_deg = jn(np.broadcast_to(
            np.asarray(g.yt)[:, None], (jmt, imt)))
        if cfg.ocean.tidal_kv:
            from .vmix import default_tidal_edr
            area_t = (np.asarray(g.cst)[:, None]
                      * np.asarray(g.dyt)[:, None]
                      * np.asarray(g.dxt)[None, :])
            self.tidal_edr = default_tidal_edr(
                np.asarray(topo.kmt), np.asarray(g.dzt),
                ht_cm=np.asarray(topo.ht), area=area_t)
            self.tidal_zw = jn(np.asarray(g.zw)[:km])

        # anisotropic viscosity / zonal-mixing static fields
        self.aniso_visc = None
        self.addisop = None
        if cfg.ocean.aniso_visc:
            from .aniso import large_anisotropic_viscosity
            vce, vcn = large_anisotropic_viscosity(
                np.asarray(g.yu), np.asarray(g.dxu), np.asarray(g.dyu),
                np.asarray(topo.umask)[0], np.asarray(g.zw)[:km],
                cfg.ocean.am, cyclic=g.cyclic)
            self.aniso_visc = (jn(vce), jn(vcn))
        if cfg.ocean.aniso_zonal:
            from .aniso import equatorial_zonal_diffusivity
            self.addisop = jn(equatorial_zonal_diffusivity(
                np.asarray(g.yt)))

        # Neptune topographic stress (O_neptune): static equilibrium
        # velocity from topography (neptune.F; const-hmix gate)
        self.unep = None
        if cfg.ocean.neptune and cfg.ocean.hmix == "const":
            from .neptune import neptune_velocity
            self.unep = jn(neptune_velocity(
                g, topo, cfg.ocean.spnep, cfg.ocean.senep))

        # geothermal bottom heat flux (O_gthflx): static host-evaluated
        # Hamza et al. (2007) harmonic field (setmom.F:1749-1754)
        self.bhf = None
        if cfg.ocean.gthflx:
            from .gthflx import geoheatflux_field
            self.bhf = jn(geoheatflux_field(np.asarray(g.xt),
                                            np.asarray(g.yt)))

        # shortwave penetration profile (O_shortwave, setmom.F:376-410):
        # Paulson & Simpson double exponential; pen(0)=0 compensates the
        # shortwave already included in the surface flux stf(temp)
        self.divpen = None
        if cfg.ocean.shortwave:
            zw = np.asarray(g.zw)[:km]
            rpart, efold1, efold2 = 0.58, 35.0, 23.0e2  # cm
            pen = rpart * np.exp(-np.minimum(zw / efold1, 70.0)) \
                + (1.0 - rpart) * np.exp(-np.minimum(zw / efold2, 70.0))
            pen0 = np.concatenate([[0.0], pen[:-1]])
            self.divpen = jn((pen0 - pen) / np.asarray(g.dzt))

        # high-latitude zonal filters (setcom.F:101-132) precomputed as
        # per-(level,row) matrices applied as one batched matmul
        if cfg.ocean.fourfil:
            from ...ops.filters import build_hlat_filter
            meth = cfg.ocean.hlat_filter
            self.filt_t = build_hlat_filter(
                meth, topo.tmask, np.asarray(g.yt), imt,
                "symmetric", g.cyclic, dt)
            self.filt_u = build_hlat_filter(
                meth, topo.umask, np.asarray(g.yu), imt,
                "asymmetric", g.cyclic, dt)
            sfmask = (topo.land_map <= 0).astype(np.float64)
            self.filt_sf = build_hlat_filter(
                meth, sfmask, np.asarray(g.yt), imt,
                "symmetric", g.cyclic, dt)
        else:
            self.filt_t = self.filt_u = self.filt_sf = None

        self.nt = params.nt
        self.tracer_index = params.tracer_index

        # biogeochemistry source model (tracer.F npzd section)
        self.npzd = None
        if cfg.bgc.suite in ("npzd", "mobi"):
            from ...models.bgc.npzd import Npzd, NpzdParams
            nz_params = NpzdParams(
                dtnpzd=cfg.bgc.dtnpzd,
                nitrogen=cfg.bgc.nitrogen, o2=cfg.bgc.o2,
                carbon=cfg.bgc.carbon, alk=cfg.bgc.alk)
            self._npzd_params = nz_params
            if cfg.bgc.suite == "mobi":
                from ...models.bgc.mobi import Mobi as _BgcCls
            else:
                _BgcCls = Npzd
            self.npzd = {
                True: _BgcCls(nz_params, g, self.tracer_index,
                              2 * cfg.ocean.dtts, dt),
                False: _BgcCls(nz_params, g, self.tracer_index,
                               cfg.ocean.dtts, dt),
            }
            self.tlat_rad = jn(np.deg2rad(
                np.broadcast_to(g.yt[:, None], (g.jmt, g.imt))))

        self._step_leapfrog = jax.jit(partial(self._step, leapfrog=True),
                                      donate_argnums=(0,))
        self._step_forward = jax.jit(partial(self._step, leapfrog=False),
                                     donate_argnums=(0,))
        self._run_scan_cache = {}
        self._step_eb = jax.jit(self._step_eb_impl)

        # fused Pallas CG for the barotropic solve: single-device TPU
        # runs only (sharded runs use the collective-friendly jnp path)
        # bottom-drag coefficient field (OceanConfig.cdbot_polar_*):
        # scalar everywhere, enhanced over the polar cap
        yu_arr = np.asarray(self.params.grid.yu)
        polar_w = 1.0 / (1.0 + np.exp(-(yu_arr
                                        - cfg.ocean.cdbot_polar_lat)
                                      / 1.5))
        cdbot_j = cfg.ocean.cdbot * (
            1.0 + (cfg.ocean.cdbot_polar_scale - 1.0) * polar_w)
        self.cdbot2d = jnp.asarray(
            np.broadcast_to(cdbot_j[:, None],
                            (self.params.grid.jmt,
                             self.params.grid.imt)).copy(),
            cfg.np_dtype)

        self.cg_solver = None
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if os.environ.get("UVIC_TPU_NO_PALLAS") == "1":
            on_tpu = False     # debug escape hatch: force XLA paths
        # fused Pallas tracer step (FCT + diffusion + invtri in one
        # VMEM-resident kernel, ops/pallas_tracer.py): the XLA roll
        # cascade is the step's dominant HBM-traffic term
        self.pallas_tracer = None
        if on_tpu and cfg.parallel.mesh_shape == (1, 1) \
                and cfg.np_dtype == np.float32 \
                and cfg.ocean.tracer_advection == "fct" \
                and cfg.ocean.fct_variant == "dlm1" \
                and not cfg.ocean.fct_3d \
                and cfg.ocean.hmix == "const":
            from ...ops.pallas_tracer import make_fct_tracer_step
            # the Redi/GM tendency is applied INSIDE the kernel from
            # the 18-slot weight pack (round 5); `source` only carries
            # bgc/penetrative-SW terms now.  UVIC_ISO_SRC=1 falls back
            # to the round-4 source-fed split (A/B escape hatch).
            self._iso_in_kernel = (cfg.ocean.isopycmix
                                   and os.environ.get("UVIC_ISO_SRC")
                                   != "1")
            has_src = (self.npzd is not None
                       or self.divpen is not None
                       or (cfg.ocean.isopycmix
                           and not self._iso_in_kernel))
            self.pallas_tracer = make_fct_tracer_step(
                self.nt, km, jmt, imt, self.g, cfg.ocean.ah,
                cfg.ocean.aidif if cfg.ocean.isopycmix else 0.0,
                ydiff_fluxform=cfg.ocean.isopycmix, has_src=has_src,
                dtype=jnp.float32, has_iso=self._iso_in_kernel)

        # Built whenever the kernel can lower; the sharded explicit-halo
        # path (parallel/shard_step.py) runs it REPLICATED inside a
        # shard_map (the 2-D solve is tiny and latency-bound if
        # sharded), so the mesh shape only gates the GSPMD `_step` use.
        self.cg_solver_rep = None
        if on_tpu and cfg.ocean.acor == 0.0 and not self.sp_mode \
                and cfg.np_dtype == np.float32:  # Pallas TPU lowers f32 only
            from ...ops.pallas_cg import make_pallas_congrad
            from ...ops.solvers import make_inv
            pid = np.asarray(topo.perim_id)
            nisle = max(topo.nisle, 1)
            oh = np.stack([(pid == k).astype(np.float64)
                           for k in range(nisle)])
            interior = np.zeros((jmt, imt))
            interior[1:-1, 1:-1] = 1.0
            pm = (pid >= 0).astype(np.float64)
            z_unit = np.asarray(make_inv(self.cf_unit, self.isl))
            self.cg_solver_rep = make_pallas_congrad(
                np.asarray(self.cf_unit), z_unit, oh,
                np.asarray(topo.perim_count), interior, pm,
                imt, jmt, cfg.ocean.mxscan, g.cyclic)
            if cfg.parallel.mesh_shape == (1, 1):
                self.cg_solver = self.cg_solver_rep

    # ------------------------------------------------------------------
    def init_state(self, t_init=None) -> OceanState:
        g = self.params.grid
        if t_init is None:
            # uniform idealized ICs from the tracer registry
            vals = np.array([t.init for t in self.tracer_index.tracers])
            t_init = (vals[:, None, None, None]
                      * np.asarray(self.params.topo.tmask)[None])
        t_init = np.asarray(t_init)
        if t_init.shape[0] < self.nt:
            # physics-only IC extended with registry defaults for bgc
            vals = np.array([t.init for t in self.tracer_index.tracers])
            full = (vals[:, None, None, None]
                    * np.asarray(self.params.topo.tmask)[None])
            full[:t_init.shape[0]] = t_init
            t_init = full
        return init_ocean_state(self.nt, g.km, g.jmt, g.imt,
                                self.cfg.np_dtype, t_init)

    def full_velocity(self, u_int, ext):
        """Internal + external mode, masked (loadmw.F add_ext_mode).
        ``ext`` is the streamfunction (jmt, imt) or, in the
        surface-pressure modes, ubar (2, jmt, imt) directly."""
        if self.sp_mode:
            uext, vext = ext[0], ext[1]
        else:
            uext, vext = ext_mode_velocity(ext, self.g.hr, self.g.dxu2r,
                                           self.g.dyu2r, self.g.csur)
        u = (u_int[0] + uext[None]) * self.umask
        v = (u_int[1] + vext[None]) * self.umask
        u = setbcx(u, self.cyclic)
        v = setbcx(v, self.cyclic)
        return jnp.stack([u, v])

    # ------------------------------------------------------------------
    def _step(self, state: OceanState, forcing: SurfaceForcing, *,
              leapfrog, eb_pass: int = 0) -> OceanState:
        """One ocean step. ``leapfrog`` may be a Python bool (two traced
        variants) or a traced bool (single trace selecting time levels
        and intervals with `where` — used by the scan driver).
        ``eb_pass``: 0 = normal; 1/2 = Euler-backward mixing passes
        (mom.F:424-446 two-pass scheme)."""
        cfg = self.cfg.ocean
        g = self.g

        if eb_pass == 2:
            # 2nd EB pass: tendencies at tau' (stored in t), interval dt
            c2dtts, c2dtuv, c2dtsf = cfg.dtts, cfg.dtuv, cfg.dtsf
            tm1, t_tau = state.tm1, state.t
            um1_int, u_int = state.um1, state.u
            psi0, psi1 = state.psi0, state.psi1
            ub_tm1 = state.ubarm1
        elif isinstance(leapfrog, bool):
            if leapfrog:
                c2dtts, c2dtuv, c2dtsf = (2 * cfg.dtts, 2 * cfg.dtuv,
                                          2 * cfg.dtsf)
                tm1, t_tau = state.tm1, state.t
                um1_int, u_int = state.um1, state.u
                psi0, psi1 = state.psi0, state.psi1
                ub_tm1 = state.ubarm1
            else:
                # forward mixing step: tau-1 <- tau (mom.F:119-148;
                # ubarm1 <- ubar at mixing-step entry, mom.F:163-167)
                c2dtts, c2dtuv, c2dtsf = cfg.dtts, cfg.dtuv, cfg.dtsf
                tm1, t_tau = state.t, state.t
                um1_int, u_int = state.u, state.u
                psi0, psi1 = state.psi0, state.psi0
                ub_tm1 = state.ubar
        else:
            lf = leapfrog
            one = jnp.asarray(1.0, state.t.dtype)
            fac = jnp.where(lf, 2.0 * one, one)
            c2dtts, c2dtuv, c2dtsf = (fac * cfg.dtts, fac * cfg.dtuv,
                                      fac * cfg.dtsf)
            tm1 = jnp.where(lf, state.tm1, state.t)
            t_tau = state.t
            um1_int = jnp.where(lf, state.um1, state.u)
            u_int = state.u
            psi0 = state.psi0
            psi1 = jnp.where(lf, state.psi1, state.psi0)
            ub_tm1 = jnp.where(lf, state.ubarm1, state.ubar)

        # full velocities at both time levels
        if self.sp_mode:
            u_tau = self.full_velocity(u_int, state.ubar)
            u_tm1 = self.full_velocity(um1_int, ub_tm1)
        else:
            u_tau = self.full_velocity(u_int, psi0)
            u_tm1 = self.full_velocity(um1_int, psi1)

        # face advection velocities (adv_vel.F)
        vet, vnt, vbt, veu, vnu, vbu = adv_vel(
            u_tau[0], u_tau[1], g, self.cyclic)

        # surface/bottom boundary fluxes (setvbc.F)
        smf = forcing.smf * self.umask[0][None]
        stf = forcing.stf * self.tmask[0][None]
        btf = (jnp.zeros_like(stf) if forcing.btf is None
               else forcing.btf * self.tmask[0][None])
        if self.bhf is not None:
            # geothermal heating of the deepest wet cell; negative =
            # upward into the bottom (setvbc.F updates/09:74-76)
            btf = btf.at[0].add(-self.bhf * self.tmask[0])
        if cfg.cdbot != 0.0:
            kb = jnp.maximum(self.kmu - 1, 0)
            ub = jnp.take_along_axis(u_tm1, kb[None, None], axis=1)[:, 0]
            uvmag = jnp.sqrt(ub[0] ** 2 + ub[1] ** 2)
            bmf = self.cdbot2d[None] * ub * uvmag[None] \
                * (self.kmu > 0)[None]
        else:
            bmf = jnp.zeros_like(smf)

        # Richardson-number mixing recomputes the coefficients per step
        # (ppmix.F); other schemes use the precomputed fields
        if cfg.vmix == "ppmix":
            from .vmix import ppmix_coefficients
            diff_cbt_base, visc_cbu = ppmix_coefficients(
                tm1, u_tm1, self.tmask, self.umask, self.eos_c,
                self.eos_to, self.eos_so, g, cyclic=self.cyclic)
        else:
            diff_cbt_base, visc_cbu = self.diff_cbt, self.visc_cbu

        # isopycnal/GM fields (isopyc.F), K33 into the implicit vertical
        # diffusivity (vmixc.F:146-156), GM velocities into advection
        if cfg.isopycmix:
            from .isopyc import compute_isopyc
            iso = compute_isopyc(tm1, self.tmask, self.kmt, self.eos_c,
                                 self.eos_to, self.eos_so, g, cfg,
                                 self.cyclic, addisop=self.addisop)
            if cfg.tidal_kv:
                # tidal-dissipation mixing (O_tidal_kv, updates/08
                # vmixc.F): needs the bottom-face density gradient
                from .vmix import tidal_kv_diff
                drodzb0 = iso.alphai * iso.ddzt[0] \
                    + iso.betai * iso.ddzt[1]
                diff_cbt_base = tidal_kv_diff(
                    drodzb0, self.kmt, self.tidal_zw, self.tlat_deg,
                    self.tidal_edr, diff_cbt_base)
            diff_cbt = diff_cbt_base + iso.K33
            if cfg.gent_mcwilliams:
                vet_t = vet + iso.vetiso
                vnt_t = vnt + iso.vntiso
                vbt_t = vbt + iso.vbtiso
            else:
                vet_t, vnt_t, vbt_t = vet, vnt, vbt
            aidif = cfg.aidif
        else:
            iso = None
            diff_cbt = diff_cbt_base
            vet_t, vnt_t, vbt_t = vet, vnt, vbt
            aidif = 0.0

        # biogeochemistry sources (tracer.F:256-521)
        source = None
        if self.npzd is not None:
            if isinstance(leapfrog, bool):
                source = self.npzd[leapfrog].sources(
                    tm1, self.kmt, self.tmask, forcing.swr, forcing.aice,
                    forcing.hice, forcing.hsno, self.tlat_rad,
                    forcing.relyr)
            else:
                source = self.npzd[True].sources(
                    tm1, self.kmt, self.tmask, forcing.swr, forcing.aice,
                    forcing.hice, forcing.hsno, self.tlat_rad,
                    forcing.relyr, c2dtts=c2dtts)

        # penetrative shortwave heating (swflux0, tracer.F:1787-1840):
        # redistribute the solar part of the surface heat flux through
        # the column with the divpen profile; 2.389e-8 converts
        # erg/cm^2/s to K cm/s (gosbc fh factor)
        if self.divpen is not None:
            psw = forcing.swr * 2.389e-8
            if forcing.aice is not None:
                ki = 5.0e-2   # ice/snow attenuation [1/cm] (npzd ki)
                psw = psw * (1.0 + forcing.aice * (
                    jnp.exp(-ki * (forcing.hice + forcing.hsno)) - 1.0))
            sw_src = (psw[None] * self.divpen[:, None, None]
                      * self.tmask)
            if source is None:
                source = jnp.zeros_like(tm1).at[0].set(sw_src)
            else:
                source = source.at[0].add(sw_src)

        # variable horizontal mixing (smagnl.F / O_biharmonic)
        hmix_t = hmix_u = None
        if cfg.hmix == "smagnl":
            from .hmix import smag_tracer_coefficients, smagnl_coefficients
            strain, am_lam, am_phi = smagnl_coefficients(
                u_tm1, g, self.cyclic)
            cet, cnt = smag_tracer_coefficients(am_lam, am_phi,
                                                cfg.smag_diff_back)
            hmix_t = ("smagnl", cet, cnt)
            hmix_u = ("smagnl", strain, am_lam, am_phi, self.sine)
        elif cfg.hmix == "biharmonic":
            hmix_t = ("biharmonic", cfg.ahbi)
            hmix_u = ("biharmonic", cfg.ambi)
        if self.aniso_visc is not None and hmix_u is None:
            # Large et al. 2001 anisotropic momentum mixing rides the
            # consthmix path with 3-D coefficients
            hmix_u = ("aniso", self.aniso_visc[0], self.aniso_visc[1])

        # tracer step (tracer.F): fused Pallas kernel on TPU, XLA
        # whole-domain graph otherwise (identical numerics, tested)
        if self.pallas_tracer is not None and hmix_t is None:
            isow = None
            if iso is not None and self._iso_in_kernel:
                # Redi flux divergence applied INSIDE the VMEM pass:
                # every tracer-independent factor (Ai*drodh/(drodz+eps),
                # metric prefactors, boundary zeroings) is folded into
                # an 18-slot weight pack computed ONCE per step; the
                # per-tracer work is ~35 shift-FMA VMEM ops instead of
                # an nt-batched XLA roll cascade through HBM (tested
                # identical to isoflux in test_isopyc.py /
                # test_pallas_tracer.py)
                from .isopyc import iso_weight_pack, iso_weight_stack
                isow = iso_weight_stack(iso_weight_pack(iso, g))
            elif iso is not None:
                from .isopyc import iso_tendency, iso_weight_pack
                iso_tend = iso_tendency(tm1, iso_weight_pack(iso, g),
                                        self.tmask, g, self.cyclic)
                source = iso_tend if source is None \
                    else source + iso_tend
            t_new = self.pallas_tracer(
                t_tau, tm1, vet_t, vnt_t, vbt_t, diff_cbt, stf, btf,
                source, c2dtts * g.dtxcel, self.tmask, self.kmt,
                isow=isow)
        else:
            t_new = tracer_step(
                t_tau, tm1, vet_t, vnt_t, vbt_t, stf, btf, source,
                diff_cbt, self.kmt, self.tmask, g, c2dtts,
                cfg.tracer_advection, aidif, self.cyclic, iso=iso,
                hmix=hmix_t, fct_variant=cfg.fct_variant,
                fct3d=cfg.fct_3d)

        # convective adjustment (convect.F); with O_convect_brine the
        # ice-category brine fluxes drive per-category convection
        # (convect_brine.F) instead of entering stf[salt]
        if cfg.convect_brine and forcing.cbf is not None:
            from ...ops.convection import convct_brine
            cba0 = jnp.maximum(0.0, 1.0 - forcing.cba.sum(0)) \
                * self.tmask[0]
            t_new = convct_brine(
                t_new, forcing.cbf, forcing.cba, cba0, self.kmt,
                self.eos_c, self.eos_to, self.eos_so, self.dztxcl,
                c2dtts, float(self.params.grid.zw[0]))
        elif cfg.convection == Convection.FULL:
            t_new = convct_full(t_new, self.kmt, self.eos_c, self.eos_to,
                                self.eos_so, self.dztxcl,
                                use_pallas=self.pallas_tracer is not None)
        else:
            t_new = convct_ncon(t_new, self.kmt, self.eos_c, self.eos_to,
                                self.eos_so, self.dztxcl, cfg.ncon)

        # high-latitude tracer filtering (tracer.F:980-993)
        if self.filt_t is not None:
            t_new = self.filt_t(t_new)
        t_new = setbcx(t_new, self.cyclic)

        # baroclinic momentum step (clinic.F); density from tau tracers
        rho = eos_state_from(self.eos_c, self.eos_to, self.eos_so, t_tau)
        u_int_new, zu = clinic_step(
            u_tau, u_tm1, rho, veu, vnu, vbu, smf, bmf,
            visc_cbu, self.kmu, self.umask, g, c2dtuv, self.cyclic,
            hmix=hmix_u, unep=self.unep)

        # high-latitude velocity filtering (clinic.F:480-493)
        if self.filt_u is not None:
            u_int_new = self.filt_u(u_int_new)
            u_int_new = setbcx(u_int_new, self.cyclic)

        # barotropic solve: streamfunction (tropic.F) or surface
        # pressure / implicit free surface (bardiv.F)
        if self.sp_mode:
            from ...config import BarotropicMode
            from .surfpress import surface_pressure_step
            alph, gam_b, theta = self.sp_consts
            fs = self.barotropic == BarotropicMode.IMPLICIT_FREE_SURFACE
            if self.filt_zu is not None:
                zu = self.filt_zu(zu)
            ps0n, ps1n, pguess, ubar_n, iters, est, conv = \
                surface_pressure_step(
                    zu, state.psi0, state.psi1, psi1, state.ptd,
                    state.ubar, ub_tm1, self.cf_sp, self.fs_diag_unit,
                    self.isl_sp, g, self.umask[0], self.sp_omask,
                    c2dtsf, cfg.dtsf,
                    cfg.tolrfs if fs else cfg.tolrsp, cfg.mxscan,
                    leapfrog, free_surface=fs, alph=alph, gam=gam_b,
                    theta=theta, acor=cfg.acor, cori=g.cori[0],
                    eb_pass=eb_pass, cyclic=self.cyclic)
            return OceanState(
                tm1=t_tau, t=t_new,
                um1=u_int, u=u_int_new,
                psi0=ps0n, psi1=ps1n, ptd=pguess, ptdb=state.ptdb,
                ubar=ubar_n,
                ubarm1=(state.ubarm1 if eb_pass == 2 else state.ubar),
                itt=state.itt + 1,
                nconv=_count_nconv(state.nconv, conv),
            )

        sf_filt = self.filt_sf
        psi0n, psi1n, ptd, ptdb, iters, est, conv = tropic_step(
            zu, psi0, psi1, state.ptd, state.ptdb,
            self.cf_unit, self.cf_acor, self.isl,
            g.dxu, g.dyu, g.csu, c2dtsf, cfg.tolrsf, cfg.mxscan,
            leapfrog, self.cyclic, filt=sf_filt,
            euler2=(eb_pass == 2), save_ptd=(eb_pass != 1),
            solver=self.cg_solver, npt=cfg.sf_npt)

        return OceanState(
            tm1=t_tau, t=t_new,
            um1=u_int, u=u_int_new,
            psi0=psi0n, psi1=psi1n, ptd=ptd, ptdb=ptdb,
            ubar=state.ubar, ubarm1=state.ubarm1,
            itt=state.itt + 1,
            nconv=_count_nconv(state.nconv, conv),
        )

    # ------------------------------------------------------------------
    def apply_restoring(self, forcing: SurfaceForcing,
                        state: OceanState, sst_field, sss_field,
                        relyr=0.0) -> SurfaceForcing:
        """O_restorst: replace the T/S surface-flux rows with Newtonian
        restoring toward time-interpolated climatology (data.F:119-142,
        checks.F:240-265).  sst_field/sss_field are
        ``io.timeforce.TimeInterpField`` (or None to leave a row)."""
        from ...io.timeforce import restoring_stf
        o = self.cfg.ocean
        stf = restoring_stf(forcing.stf, state.t[:, 0], sst_field,
                            sss_field, relyr, o.dampts, o.dampdz,
                            self.tmask[0])
        return forcing.replace(stf=stf)

    # ------------------------------------------------------------------
    def step(self, state: OceanState, forcing: SurfaceForcing,
             leapfrog: bool = True) -> OceanState:
        if not leapfrog and self.cfg.ocean.eb:
            return self._step_eb(state, forcing)
        fn = self._step_leapfrog if leapfrog else self._step_forward
        return fn(state, forcing)

    def _step_eb_impl(self, state: OceanState,
                      forcing: SurfaceForcing) -> OceanState:
        """Euler-backward mixing step (mom.F:424-446): a forward
        predictor pass (euler1) whose tau+1 fields become the tau
        arguments for a corrector pass (euler2)."""
        s1 = self._step(state, forcing, leapfrog=False, eb_pass=1)
        if self.sp_mode:
            # euler1 committed pguess (+ps for free surface) into s1;
            # euler2 solves against the original ps levels (bardiv.F)
            mid = OceanState(
                tm1=state.t, t=s1.t, um1=state.u, u=s1.u,
                psi0=s1.psi0, psi1=s1.psi1,
                ptd=s1.ptd, ptdb=state.ptdb,
                ubar=s1.ubar, ubarm1=s1.ubarm1, itt=state.itt,
                nconv=s1.nconv)
        else:
            mid = OceanState(
                tm1=state.t, t=s1.t, um1=state.u, u=s1.u,
                psi0=s1.psi0, psi1=state.psi0,
                ptd=state.ptd, ptdb=state.ptdb,
                ubar=state.ubar, ubarm1=state.ubarm1, itt=state.itt,
                nconv=s1.nconv)
        s2 = self._step(mid, forcing, leapfrog=False, eb_pass=2)
        # euler_shuffle: tau-1 <- tau(original), tau <- tau+1
        return s2.replace(tm1=state.t, um1=state.u, itt=state.itt + 1)

    def run(self, state: OceanState, forcing: SurfaceForcing,
            nsteps: int, nmix: int | None = None) -> OceanState:
        """Run nsteps with the reference mixing cadence: a forward step
        every ``nmix`` steps (mom.F leapfrog control, itt%nmix==1)."""
        nmix = nmix or self.cfg.ocean.nmix
        for n in range(nsteps):
            leapfrog = (int(state.itt) % nmix) != 0
            state = self.step(state, forcing, leapfrog=leapfrog)
        return state

    def run_restoring(self, state: OceanState, smf,
                      sst_field=None, sss_field=None, nseg: int = 1,
                      seg_days: float = 30.0, relyr0: float = 0.0,
                      yrlen: float = 365.0,
                      climatology: str = "seasonal") -> OceanState:
        """Ocean-only production driver with Newtonian surface
        restoring (O_restorst, data.F:119-142): each segment
        interpolates the SST/SSS climatology at the segment midpoint,
        converts it to surface fluxes against the CURRENT surface state
        (setvbc restoring path), and scans the segment's steps as one
        device program.  This is the classic spin-up configuration of
        the reference (restoring run before coupling).

        smf : (2, jmt, imt) wind stress; sst_field/sss_field :
        io.timeforce.TimeInterpField or None.
        """
        from ...io.timeforce import (TimeInterpField,
                                     default_surface_climatology)
        if sst_field is None and sss_field is None:
            if climatology == "bcest":
                # annual-mean Levitus/H&R zonal estimates (bcest.F) —
                # the reference's idealized standalone-ocean restoring
                from ...io.bcest import bcest_fields
                f = bcest_fields(self.params.grid,
                                 dtype=self.cfg.np_dtype)
                sst_field = TimeInterpField(f["sst"][None],
                                            dtype=self.cfg.np_dtype)
                sss_field = TimeInterpField(
                    (f["sss"][None] - 35.0) / 1000.0,
                    dtype=self.cfg.np_dtype)
            else:
                sst_field, sss_field = default_surface_climatology(
                    self.params.grid, dtype=self.cfg.np_dtype)
        nsteps = max(1, round(seg_days * 86400.0 / self.cfg.ocean.dtts))
        stf0 = jnp.zeros((self.nt, self.params.grid.jmt,
                          self.params.grid.imt), self.cfg.np_dtype)
        relyr = relyr0
        for _ in range(nseg):
            mid = relyr + 0.5 * seg_days / yrlen
            forcing = make_forcing(smf, stf0,
                                   relyr=jnp.asarray(mid,
                                                     self.cfg.np_dtype))
            forcing = self.apply_restoring(forcing, state, sst_field,
                                           sss_field, relyr=mid)
            state = self.run_scan(state, forcing, nsteps)
            relyr += seg_days / yrlen
        return state

    def run_scan(self, state: OceanState, forcing: SurfaceForcing,
                 nsteps: int) -> OceanState:
        """Run ``nsteps`` inside ONE jitted `lax.scan`: the mixing-step
        selection is data-dependent (itt % nmix), so a single trace
        covers both step types and per-step dispatch overhead vanishes.
        This is the production inner loop (the reference's segment of
        ocean steps runs as one device program)."""
        fn = self._run_scan_cache.get(nsteps)
        if fn is None:
            nmix = self.cfg.ocean.nmix

            @partial(jax.jit, donate_argnums=(0,))
            def fn(s, f):
                def body(carry, _):
                    lf = (carry.itt % nmix) != 0
                    return self._step(carry, f, leapfrog=lf), None
                out, _ = jax.lax.scan(body, s, None, length=nsteps)
                return out

            self._run_scan_cache[nsteps] = fn
        return fn(state, forcing)


def _count_nconv(nconv, conv):
    """Cumulative solver non-convergence counter (tropic.F:242-250
    nconv; `Run` aborts when it exceeds 50)."""
    if nconv is None:
        return None
    bad = jnp.logical_not(jnp.asarray(conv, bool)).astype(jnp.int32)
    return nconv + bad


def eos_state_from(c, to, so, t):
    """Density anomaly field from the tracer block (state.F:54-60)."""
    from ...ops.eos import dens
    return dens(c[:, None, None, :], t[0] - to[:, None, None],
                t[1] - so[:, None, None])


def make_ocean(cfg: ModelConfig | None = None, topo_kind: str = "world",
               **kw) -> OceanModel:
    cfg = cfg or ModelConfig()
    params = build_ocean_params(cfg, topo_kind=topo_kind, **kw)
    return OceanModel(params)
