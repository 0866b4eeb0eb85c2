"""shard_map ocean step with ONE aggregated halo exchange.

Alternative to the GSPMD path (mesh.py) for the ocean dynamical core
hot path (SURVEY.md §7.2-8): all stencil-consuming state is packed into
a single array, halo-exchanged once per step (two ppermute pairs), and
the unchanged whole-domain kernels (full_velocity, adv_vel, isopyc/GM,
tracer_step, clinic_step) then run on halo-padded local blocks.  The
halo width covers the full stencil composition depth, so every kept
cell computes exactly the global answer; the shard-edge frame computes
garbage and is cropped.  Column-local phases (EOS, bgc sources,
convection, invtri) and the global phases (high-latitude filter
matmuls, barotropic CG) run outside the region under GSPMD, where XLA
needs no halo collectives for them.

Compared to pure GSPMD this trades ~((l+2w)^2/l^2 - 1) redundant
compute for collapsing dozens of per-shift collective-permutes into
one exchange whose latency can hide behind the column-local work.
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .halo import (BAG_AXES, ExtendedStatics, crop, crop_window,
                   pack_exchange, pad_window, pad_zeros)


class ShardedOceanStep:
    """Wraps an OceanModel with an explicit-halo shard_map step.

    Support matrix (the asserts below are authoritative):

    | concern            | shard_map path        | GSPMD fallback    |
    |--------------------|-----------------------|-------------------|
    | barotropic         | streamfunction        | sp/ifs modes      |
    | vmix               | const / bryan_lewis   | ppmix             |
    |                    | (+tidal_kv)           |                   |
    | hmix               | const / aniso /       | smagnl            |
    |                    | biharmonic            |                   |
    | tracer advection   | centered/upstream/FCT | quicker           |
    | isopycnal/GM       | yes                   | yes               |
    | domain             | cyclic only           | any               |

    ``halo=None`` derives the width from the configured stencil depth
    (see required_halo).
    """

    @staticmethod
    def required_halo(cfg) -> int:
        """Halo width from the configured stencil composition depth —
        the size.h:80-100 jmw law recast for one aggregated exchange
        per FULL step (the reference's window covers one kernel at a
        time; here every kernel between exchanges consumes stencil
        cells from the same padded block, so depths ADD):

          full_velocity(ext-mode diag diff)          1
          adv_vel (vet/vnt -> vbt -> veu/vnu/vbu)    2
          advective flux + divergence                2  (FCT: +2 for
                                                        the low-order
                                                        solution feeding
                                                        the delimiters)
          isopycnal slopes -> isoflux divergence     2  (when enabled)
          clinic grad_p/metric/diffusion             2
          biharmonic del^2 o del^2                   +2 (when enabled)

        The sums below are conservative per-configuration totals,
        asserted against the hand-validated defaults in
        tests/test_shardmap_step.py.
        """
        w = 1 + 2 + 2 + 2          # velocity/adv_vel/flux/clinic chain
        if cfg.tracer_advection == "fct":
            w += 2                 # low-order solution pre-pass
        if cfg.isopycmix:
            w += 2                 # slope quadruples + isoflux
        if cfg.hmix == "biharmonic":
            w += 2                 # second Laplacian pass
        return w

    def __init__(self, model, mesh, halo: int | None = None):
        if halo is None:
            halo = self.required_halo(model.cfg.ocean)
        cfg = model.cfg.ocean
        assert not model.sp_mode, "shard_map path: streamfunction only"
        assert cfg.vmix != "ppmix", "shard_map path: const/BL vmix only"
        assert model.cyclic, "shard_map path: cyclic domains only"
        assert cfg.hmix != "smagnl", "shard_map path: smagnl via GSPMD"
        assert cfg.tracer_advection != "quicker", \
            "shard_map path: quicker via GSPMD"
        self.m = model
        self.mesh = mesh
        g = model.params.grid
        self.ny, self.nx = mesh.devices.shape
        self.yname, self.xname = mesh.axis_names
        self.w = halo
        # divisibility lift: pad the window to mesh multiples — x pad
        # columns are periodic images, y pad rows lie beyond the wall
        self.jmt, self.imt = g.jmt, g.imt
        self.jmt_p = -(-g.jmt // self.ny) * self.ny
        self.imt_p = -(-g.imt // self.nx) * self.nx
        self.gx = 2 + (self.imt_p - g.imt)
        ly, lx = self.jmt_p // self.ny, self.imt_p // self.nx
        if self.ny > 1:
            assert halo <= ly, f"halo {halo} > local rows {ly}"
        if self.nx > 1:
            assert halo + self.gx <= lx, \
                f"halo {halo} + ghosts {self.gx} > local cols {lx}"

        # ---- extended static constants (one-time host work) ----------
        arrays = {k: getattr(model.g, k) for k in BAG_AXES
                  if hasattr(model.g, k)}
        axes = {k: BAG_AXES[k] for k in arrays}
        extra = {
            "tmask": ("yx", model.tmask, "zero"),
            "umask": ("yx", model.umask, "zero"),
            "kmt": ("yx", model.kmt, "zero"),
            "kmu": ("yx", model.kmu, "zero"),
            "diff_cbt": ("yx", model.diff_cbt, "clamp"),
            "visc_cbu": ("yx", model.visc_cbu, "clamp"),
            "eos_c": ("skip", model.eos_c, None),
            "eos_to": ("skip", model.eos_to, None),
            "eos_so": ("skip", model.eos_so, None),
            "addisop": ("y", model.addisop, "clamp"),
            "tlat_deg": ("yx", model.tlat_deg, "clamp"),
            "tidal_edr": ("yx", model.tidal_edr, "zero"),
            "aniso_vce": ("yx", model.aniso_visc[0]
                          if model.aniso_visc else None, "clamp"),
            "aniso_vcn": ("yx", model.aniso_visc[1]
                          if model.aniso_visc else None, "clamp"),
        }
        fills = {}
        for k, (kind, a, fill) in extra.items():
            arrays[k] = a if a is not None else None
            axes[k] = kind if a is not None else "skip"
            if fill:
                fills[k] = fill
        self.stat = ExtendedStatics(arrays, axes, g.jmt, g.imt,
                                    self.ny, self.nx, halo, fills,
                                    jmt_p=self.jmt_p, imt_p=self.imt_p)

        def spec(ndim):
            if ndim < 2:
                return P()
            return P(*([None] * (ndim - 2)), self.yname, self.xname)

        self._spec = spec
        self._step_jit = {}

    # ------------------------------------------------------------------
    def _core(self, c2dtts, c2dtuv, t_tau, tm1, u_int, um1_int,
              psi0, psi1, smf, stf, btf, source):
        """Per-shard body: pad, run the whole-domain kernels on the
        padded block, crop.  Returns (t_new_precvt, u_int_new, zu)."""
        m, w = self.m, self.w
        cfg = m.cfg.ocean
        iy = jax.lax.axis_index(self.yname)
        ix = jax.lax.axis_index(self.xname)
        st = self.stat
        bag = st.bag(iy, ix)
        tmask = bag.tmask
        umask = bag.umask
        kmt, kmu = bag.kmt, bag.kmu

        # ONE exchange for everything the stencil cascade reads
        t_tau, tm1, u_int, um1_int, psi0, psi1 = pack_exchange(
            [t_tau, tm1, u_int, um1_int, psi0, psi1], w,
            self.yname, self.xname, self.ny, self.nx, gx=self.gx)
        smf = pad_zeros(smf, w)
        stf = pad_zeros(stf, w)
        btf = pad_zeros(btf, w)
        if source is not None:
            source = pad_zeros(source, w)

        from ..models.ocean.kernels import (adv_vel, clinic_step,
                                            tracer_step)
        from ..models.ocean.model import eos_state_from
        from ..models.ocean.tropic import ext_mode_velocity

        def full_velocity(ui, psi):
            uext, vext = ext_mode_velocity(psi, bag.hr, bag.dxu2r,
                                           bag.dyu2r, bag.csur)
            u = (ui[0] + uext[None]) * umask
            v = (ui[1] + vext[None]) * umask
            return jnp.stack([u, v])

        u_tau = full_velocity(u_int, psi0)
        u_tm1 = full_velocity(um1_int, psi1)

        vet, vnt, vbt, veu, vnu, vbu = adv_vel(
            u_tau[0], u_tau[1], bag, cyclic=True)

        if cfg.cdbot != 0.0:
            kb = jnp.maximum(kmu - 1, 0)
            ub = jnp.take_along_axis(u_tm1, kb[None, None], axis=1)[:, 0]
            uvmag = jnp.sqrt(ub[0] ** 2 + ub[1] ** 2)
            bmf = cfg.cdbot * ub * uvmag[None] * (kmu > 0)[None]
        else:
            bmf = jnp.zeros_like(smf)

        diff_cbt_base, visc_cbu = bag.diff_cbt, bag.visc_cbu

        iso = None
        if cfg.isopycmix:
            from ..models.ocean.isopyc import compute_isopyc
            iso = compute_isopyc(tm1, tmask, kmt, m.eos_c, m.eos_to,
                                 m.eos_so, bag, cfg, True,
                                 addisop=bag.addisop)
            if cfg.tidal_kv:
                from ..models.ocean.vmix import tidal_kv_diff
                drodzb0 = iso.alphai * iso.ddzt[0] \
                    + iso.betai * iso.ddzt[1]
                diff_cbt_base = tidal_kv_diff(
                    drodzb0, kmt, m.tidal_zw, bag.tlat_deg,
                    bag.tidal_edr, diff_cbt_base)
            diff_cbt = diff_cbt_base + iso.K33
            if cfg.gent_mcwilliams:
                vet_t, vnt_t, vbt_t = (vet + iso.vetiso,
                                       vnt + iso.vntiso,
                                       vbt + iso.vbtiso)
            else:
                vet_t, vnt_t, vbt_t = vet, vnt, vbt
            aidif = cfg.aidif
        else:
            diff_cbt = diff_cbt_base
            vet_t, vnt_t, vbt_t = vet, vnt, vbt
            aidif = 0.0

        hmix_t = hmix_u = None
        if cfg.hmix == "biharmonic":
            hmix_t = ("biharmonic", cfg.ahbi)
            hmix_u = ("biharmonic", cfg.ambi)
        if m.aniso_visc is not None and hmix_u is None:
            hmix_u = ("aniso", bag.aniso_vce, bag.aniso_vcn)

        t_new = tracer_step(
            t_tau, tm1, vet_t, vnt_t, vbt_t, stf, btf, source,
            diff_cbt, kmt, tmask, bag, c2dtts,
            cfg.tracer_advection, aidif, True, iso=iso, hmix=hmix_t,
            fct_variant=cfg.fct_variant, fct3d=cfg.fct_3d)

        rho = eos_state_from(m.eos_c, m.eos_to, m.eos_so, t_tau)
        u_int_new, zu = clinic_step(
            u_tau, u_tm1, rho, veu, vnu, vbu, smf, bmf,
            visc_cbu, kmu, umask, bag, c2dtuv, True,
            hmix=hmix_u)

        return crop(t_new, w), crop(u_int_new, w), crop(zu, w)

    # ------------------------------------------------------------------
    def _build(self, leapfrog: bool):
        """Jitted full step: GSPMD outer phases + shard_map hot core."""
        m = self.m
        cfg = m.cfg.ocean
        from jax import shard_map

        if leapfrog:
            c2dtts, c2dtuv, c2dtsf = (2 * cfg.dtts, 2 * cfg.dtuv,
                                      2 * cfg.dtsf)
        else:
            c2dtts, c2dtuv, c2dtsf = cfg.dtts, cfg.dtuv, cfg.dtsf

        spec = self._spec
        in_specs = (spec(4), spec(4), spec(4), spec(4), spec(2),
                    spec(2), spec(3), spec(3), spec(3), spec(4))
        out_specs = (spec(4), spec(4), spec(3))
        core = shard_map(partial(self._core, c2dtts, c2dtuv),
                         mesh=self.mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)

        def step_fn(state, forcing):
            from ..config import Convection
            from ..models.ocean.model import _count_nconv
            from ..models.ocean.tropic import tropic_step
            from ..ops.convection import convct_full, convct_ncon
            from ..ops.stencil import setbcx

            if leapfrog:
                tm1, t_tau = state.tm1, state.t
                um1_int, u_int = state.um1, state.u
                psi0, psi1 = state.psi0, state.psi1
            else:
                tm1, t_tau = state.t, state.t
                um1_int, u_int = state.u, state.u
                psi0, psi1 = state.psi0, state.psi0

            smf = forcing.smf * m.umask[0][None]
            stf = forcing.stf * m.tmask[0][None]
            btf = (jnp.zeros_like(stf) if forcing.btf is None
                   else forcing.btf * m.tmask[0][None])
            if m.bhf is not None:
                btf = btf.at[0].add(-m.bhf * m.tmask[0])

            source = None
            if m.npzd is not None:
                source = m.npzd[leapfrog].sources(
                    tm1, m.kmt, m.tmask, forcing.swr, forcing.aice,
                    forcing.hice, forcing.hsno, m.tlat_rad,
                    forcing.relyr)
            if m.divpen is not None:
                psw = forcing.swr * 2.389e-8
                if forcing.aice is not None:
                    ki = 5.0e-2
                    psw = psw * (1.0 + forcing.aice * (
                        jnp.exp(-ki * (forcing.hice + forcing.hsno))
                        - 1.0))
                sw_src = (psw[None] * m.divpen[:, None, None] * m.tmask)
                if source is None:
                    source = jnp.zeros_like(tm1).at[0].set(sw_src)
                else:
                    source = source.at[0].add(sw_src)
            if source is None:
                source = jnp.zeros_like(tm1)

            # window padding (divisibility lift): periodic-image x
            # columns / beyond-wall y rows in, cropped back out
            jmt_p, imt_p = self.jmt_p, self.imt_p

            def pw(a):
                return pad_window(a, jmt_p, imt_p)

            t_new, u_int_new, zu = core(
                pw(t_tau), pw(tm1), pw(u_int), pw(um1_int),
                pw(psi0), pw(psi1), pw(smf), pw(stf), pw(btf),
                pw(source))
            t_new = crop_window(t_new, self.jmt, self.imt)
            u_int_new = crop_window(u_int_new, self.jmt, self.imt)
            zu = crop_window(zu, self.jmt, self.imt)

            if cfg.convection == Convection.FULL:
                t_new = convct_full(t_new, m.kmt, m.eos_c, m.eos_to,
                                    m.eos_so, m.dztxcl)
            else:
                t_new = convct_ncon(t_new, m.kmt, m.eos_c, m.eos_to,
                                    m.eos_so, m.dztxcl, cfg.ncon)
            if m.filt_t is not None:
                t_new = m.filt_t(t_new)
            t_new = setbcx(t_new, True)
            if m.filt_u is not None:
                u_int_new = m.filt_u(u_int_new)
                u_int_new = setbcx(u_int_new, True)

            # Barotropic solve: REPLICATED, not sharded.  The elliptic
            # problem is 2-D (jmt, imt) — tiny next to the 3-D state —
            # and a sharded CG would issue 2 psums + 1 halo exchange
            # per iteration, hundreds of latency-bound sequential
            # collectives.  Running it identically on every device
            # costs one all-gather of zu and is bitwise-deterministic:
            # the near-null modes of the streamfunction operator
            # amplify reduction-ordering differences by ~1e4, so a
            # sharded solve cannot match the single-device trajectory.
            g = m.g
            rep = P()

            def _tropic(zu_r, psi0_r, psi1_r, ptd_r, ptdb_r):
                return tropic_step(
                    zu_r, psi0_r, psi1_r, ptd_r, ptdb_r,
                    m.cf_unit, m.cf_acor, m.isl,
                    g.dxu, g.dyu, g.csu, c2dtsf, cfg.tolrsf,
                    cfg.mxscan, leapfrog, True, filt=m.filt_sf,
                    solver=m.cg_solver_rep, npt=cfg.sf_npt)

            psi0n, psi1n, ptd, ptdb, iters, est, conv = shard_map(
                _tropic, mesh=self.mesh,
                in_specs=(rep,) * 5, out_specs=(rep,) * 7,
                check_vma=False)(
                    zu, psi0, psi1, state.ptd, state.ptdb)

            from ..core.state import OceanState
            return OceanState(
                tm1=t_tau, t=t_new, um1=u_int, u=u_int_new,
                psi0=psi0n, psi1=psi1n, ptd=ptd, ptdb=ptdb,
                ubar=state.ubar, ubarm1=state.ubarm1,
                itt=state.itt + 1,
                nconv=_count_nconv(state.nconv, conv))

        return step_fn

    # ------------------------------------------------------------------
    def step(self, state, forcing, leapfrog: bool = True):
        fn = self._step_jit.get(leapfrog)
        if fn is None:
            # no explicit in_shardings: the 3-D fields arrive sharded
            # (shard_map in_specs pin them), while the 2-D barotropic
            # fields live REPLICATED between steps (see _build).
            fn = jax.jit(self._build(leapfrog))
            self._step_jit[leapfrog] = fn
        return fn(state, forcing)
