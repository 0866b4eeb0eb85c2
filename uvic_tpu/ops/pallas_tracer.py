"""Fused Pallas tracer step: FCT advection + harmonic diffusion +
implicit vertical mixing in ONE VMEM-resident kernel per tracer.

The XLA path (`models/ocean/kernels.py:tracer_step`) spends ~70% of the
flagship step in the FCT/diffusion stack: the ~45 `jnp.roll` shifts on
(nt, km, jmt, imt) arrays each materialize a 32 MB copy through HBM.
Here one `pallas_call` with grid=(nt,) keeps the whole (km, jmt, imt)
column block of a tracer in VMEM, performs every shift as an in-register
lane/sublane rotation, and runs the Zalesak limiter, the harmonic
diffusion, the source add and the unrolled Thomas solve (invtri.F)
without touching HBM in between.  Shared fields (advective velocities,
masks, diffusivities, metric factors) keep a constant block index so
Mosaic fetches them once.

Traffic drops from ~5 GB to ~0.2 GB per step (t_tau, tm1, source read
once, t_new written once, shared fields once).

Numerics are IDENTICAL to tracer_step(scheme="fct"): the kernel is
tested elementwise against it (tests/test_pallas_tracer.py) in
interpreter mode, and the two paths agree on TPU to f32 round-off.

Reference: source/mom/tracer.F:678-916, tracer_adv_flx.F:376-1005
(O_fct dlm1), invtri.F:1-115.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPSLN


def _roll(a, shift, axis):
    return jnp.roll(a, shift, axis=axis)


def _E(a):
    return _roll(a, -1, -1)


def _W(a):
    return _roll(a, 1, -1)


def _N(a):
    return _roll(a, -1, -2)


def _S(a):
    return _roll(a, 1, -2)


def _UP(a):
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


def _DN(a):
    return jnp.concatenate([a[1:], jnp.zeros_like(a[:1])], axis=0)


def _set_k(a, k, v):
    """a with level k (0 or -1) replaced by v (static k)."""
    if k == 0:
        return jnp.concatenate([v[None], a[1:]], axis=0)
    return jnp.concatenate([a[:-1], v[None]], axis=0)


def _setbcx(a, lane):
    """Cyclic ghost columns: col 0 <- col imt-2, col imt-1 <- col 1."""
    imt = a.shape[-1]
    v0 = _roll(a, 2, -1)     # lane 0 holds old lane imt-2
    vL = _roll(a, -2, -1)    # lane imt-1 holds old lane 1
    return jnp.where(lane == 0, v0, jnp.where(lane == imt - 1, vL, a))


def _limit(anti, cpos, cneg):
    return 0.5 * ((cpos + cneg) * anti + (cpos - cneg) * jnp.abs(anti))


def _kernel(t_tau_ref, tm1_ref, vet_ref, vnt_ref, vbt_ref, tmask_ref,
            dcb_ref, stf_ref, btf_ref, src_ref, isow_ref, kfac_ref,
            jif_ref, kmt_ref, out_ref, *, km, jmt, imt, aidif, has_src,
            ydiff_fluxform, has_iso):
    f32 = t_tau_ref.dtype
    t0 = t_tau_ref[0]
    tm = tm1_ref[0]
    vet = vet_ref[:]
    vnt = vnt_ref[:]
    vbt = vbt_ref[:]
    tmask = tmask_ref[:]
    tmaski = 1.0 - tmask

    # per-level factors arrive pre-broadcast as (km, 1, imt): every use
    # is a sublane-dim broadcast, which Mosaic lowers natively (1-D
    # vector reshapes are unsupported)
    kf = kfac_ref[:]
    twodt = kf[0]
    dzt2r = kf[1]
    dztr = kf[2]
    dzwr_b = kf[3]
    dztur = kf[4]
    dztlr = kf[5]

    jif = jif_ref[:]
    cstdxt2r = jif[0]
    cstdyt2r = jif[1]
    cstdxtr = jif[2]
    ah_cstdxur = jif[3]
    yA = jif[4]
    yB = jif[5]

    kmt = kmt_ref[:]                       # (jmt, imt) float level count
    levels = jax.lax.broadcasted_iota(jnp.int32, (km, jmt, imt), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (km, jmt, imt), 2)
    is_bot = levels == (kmt[None].astype(jnp.int32) - 1)

    stf = stf_ref[0]
    btf = btf_ref[0]

    # ---- FCT low-order upstream solution ------------------------------
    fe_lo = vet * (tm + _E(tm)) + jnp.abs(vet) * (tm - _E(tm))
    fn_lo = vnt * (tm + _N(tm)) + jnp.abs(vnt) * (tm - _N(tm))
    fb_lo = vbt * (_DN(tm) + tm) + jnp.abs(vbt) * (_DN(tm) - tm)
    fb_lo = _set_k(fb_lo, -1, jnp.zeros((jmt, imt), f32))

    t_lo = tm - twodt * (
        (fe_lo - _W(fe_lo)) * cstdxt2r
        + (fn_lo - _S(fn_lo)) * cstdyt2r
        + (_UP(fb_lo) - fb_lo) * dzt2r) * tmask
    t_lo = _setbcx(t_lo, lane)

    def ratios(trmax, trmin, p_plus, p_minus):
        q_plus = trmax - t_lo
        q_minus = t_lo - trmin
        rpl = jnp.minimum(1.0, tmask * q_plus / (p_plus + EPSLN))
        rmn = jnp.minimum(1.0, tmask * q_minus / (p_minus + EPSLN))
        return rpl, rmn

    tend = jnp.zeros((km, jmt, imt), f32)

    # ---- x-direction ---------------------------------------------------
    anti = vet * (t0 + _E(t0)) - fe_lo
    halfway = 0.5 * (_W(t0) + t0)
    fxa = _W(tmask) * halfway + _W(tmaski) * t_lo
    fxb = _E(tmask) * _E(halfway) + _E(tmaski) * t_lo
    trmax = jnp.maximum(jnp.maximum(fxa, fxb), t_lo)
    trmin = jnp.minimum(jnp.minimum(fxa, fxb), t_lo)
    dcf = twodt * cstdxt2r
    p_plus = dcf * (jnp.maximum(0.0, _W(anti)) - jnp.minimum(0.0, anti))
    p_minus = dcf * (jnp.maximum(0.0, anti) - jnp.minimum(0.0, _W(anti)))
    rpl, rmn = ratios(trmax, trmin, p_plus, p_minus)
    rpl = _setbcx(rpl, lane)
    rmn = _setbcx(rmn, lane)
    fe = _limit(anti, jnp.minimum(_E(rpl), rmn),
                jnp.minimum(rpl, _E(rmn))) + fe_lo
    tend = tend - (fe - _W(fe)) * cstdxt2r

    # ---- y-direction ---------------------------------------------------
    anti = vnt * (t0 + _N(t0)) - fn_lo
    hw_s = 0.5 * (_S(t0) + t0)
    hw_n = 0.5 * (t0 + _N(t0))
    fxa = _S(tmask) * hw_s + _S(tmaski) * t_lo
    fxb = _N(tmask) * hw_n + _N(tmaski) * t_lo
    trmax = jnp.maximum(jnp.maximum(fxa, fxb), t_lo)
    trmin = jnp.minimum(jnp.minimum(fxa, fxb), t_lo)
    dcf = twodt * cstdyt2r
    p_plus = dcf * (jnp.maximum(0.0, _S(anti)) - jnp.minimum(0.0, anti))
    p_minus = dcf * (jnp.maximum(0.0, anti) - jnp.minimum(0.0, _S(anti)))
    rpl, rmn = ratios(trmax, trmin, p_plus, p_minus)
    fn = (_limit(anti, jnp.minimum(_N(rpl), rmn),
                 jnp.minimum(rpl, _N(rmn))) + fn_lo) * tmask
    tend = tend - (fn - _S(fn)) * cstdyt2r

    # ---- z-direction ---------------------------------------------------
    anti = vbt * (t0 + _DN(t0)) - fb_lo * tmask
    anti = _set_k(anti, -1, jnp.zeros((jmt, imt), f32))
    hw_up = 0.5 * (_UP(t0) + t0)
    hw_dn = 0.5 * (t0 + _DN(t0))
    fxa = _UP(tmask) * hw_up + _UP(tmaski) * t_lo
    fxa = _set_k(fxa, 0, t_lo[0])
    fxb = _DN(tmask) * hw_dn + _DN(tmaski) * t_lo
    fxb = _set_k(fxb, -1, t_lo[km - 1])
    trmax = jnp.maximum(jnp.maximum(fxa, fxb), t_lo)
    trmin = jnp.minimum(jnp.minimum(fxa, fxb), t_lo)
    dcf = twodt * dzt2r
    p_plus = dcf * (jnp.maximum(0.0, anti) - jnp.minimum(0.0, _UP(anti)))
    p_minus = dcf * (jnp.maximum(0.0, _UP(anti)) - jnp.minimum(0.0, anti))
    rpl, rmn = ratios(trmax, trmin, p_plus, p_minus)
    fb = (_limit(anti, jnp.minimum(rpl, _DN(rmn)),
                 jnp.minimum(_DN(rpl), rmn)) + fb_lo) * tmask
    fb = _set_k(fb, -1, jnp.zeros((jmt, imt), f32))
    tend = tend - (_UP(fb) - fb) * dzt2r

    # ---- horizontal diffusion ------------------------------------------
    diff_fe = ah_cstdxur * (_E(tm) - tm)
    tend = tend + (diff_fe * _E(tmask)
                   - _W(diff_fe) * _W(tmask)) * cstdxtr
    if ydiff_fluxform:
        # isopycnal branch: flux-form meridional diffusion
        # (tracer.F:711-727); yA = ah*csu*dyur, yB = 1/(cst*dyt)
        diff_fn = yA * (_N(tm) - tm)
        tend = tend + (diff_fn * _N(tmask)
                       - _S(diff_fn) * _S(tmask)) * yB
    else:
        tend = tend + (yA * _N(tmask) * (_N(tm) - tm)
                       - yB * _S(tmask) * (tm - _S(tm)))

    # ---- explicit vertical diffusion -----------------------------------
    dcb = dcb_ref[:]
    diff_fb = dcb * dzwr_b * (tm - _DN(tm))
    diff_fb = _set_k(diff_fb, -1, jnp.zeros((jmt, imt), f32))
    diff_fb = jnp.where(is_bot, btf[None], diff_fb)
    fb_above = _set_k(_UP(diff_fb), 0, stf)
    tend = tend + (fb_above - diff_fb) * dztr * (1.0 - aidif)

    if has_iso:
        # ---- Redi/GM isopycnal tendency from the 18-slot weight pack
        # (isopyc.iso_tendency folded into the VMEM pass; the weights
        # are tracer-independent, computed once per step, and fetched
        # once per kernel call — the per-tracer work here is ~35
        # shift-FMA VMEM ops instead of an nt-batched XLA roll cascade
        # through HBM).  Layout (see model.py _ISO_SLOTS):
        #   0..3  we[ip][kr]   4..7  wn[jq][kr]
        #   8..11 wbx[ip][kr] 12..15 wby[jq][kr]   16 k11c  17 k22c
        iw = isow_ref[:]
        tEm = _E(tm)
        tNm = _N(tm)
        tDNm = _DN(tm)

        def vd0(f):        # vdiff kr=0: UP(f) - f (weights zero k=0)
            return _UP(f) - f

        def vd1(f):        # vdiff kr=1: f - DN(f) (weights zero km-1)
            return f - _DN(f)

        fe_i = (iw[16] * (tEm - tm)
                - iw[0] * vd0(tm) - iw[1] * vd1(tm)
                - iw[2] * vd0(tEm) - iw[3] * vd1(tEm))
        fn_i = (iw[17] * (tNm - tm)
                - iw[4] * vd0(tm) - iw[5] * vd1(tm)
                - iw[6] * vd0(tNm) - iw[7] * vd1(tNm))
        fb_i = -(iw[8] * (tm - _W(tm)) + iw[9] * (tEm - tm)
                 + iw[10] * (tDNm - _W(tDNm))
                 + iw[11] * (_E(tDNm) - tDNm)
                 + iw[12] * (tm - _S(tm)) + iw[13] * (tNm - tm)
                 + iw[14] * (tDNm - _S(tDNm))
                 + iw[15] * (_N(tDNm) - tDNm))
        tend = tend + (fe_i * _E(tmask) - _W(fe_i) * _W(tmask)) \
            * cstdxtr
        tend = tend + (fn_i * _N(tmask) - _S(fn_i) * _S(tmask)) * yB
        tend = tend + (_UP(fb_i) - fb_i) * dztr

    if has_src:
        tend = tend + src_ref[0]

    t_new = tm + twodt * tend * tmask

    # ---- implicit vertical diffusion (invtri.F, unrolled Thomas) ------
    if aidif > 0.0:
        eps = 1.0e-30
        factu = dztur * twodt * aidif
        factl = dztlr * twodt * aidif
        dcb_up = jnp.concatenate([dcb[:1], dcb[:-1]], axis=0)
        mask_dn = jnp.concatenate([tmask[1:], tmask[-1:]], axis=0)
        a = -dcb_up * factu * tmask
        c = -dcb * factl * mask_dn
        a = _set_k(a, 0, jnp.zeros((jmt, imt), f32))
        c = _set_k(c, -1, jnp.zeros((jmt, imt), f32))
        b = 1.0 - a - c
        f = t_new * tmask
        f = _set_k(f, 0, f[0] + stf * twodt[0] * dztr[0]
                   * aidif * tmask[0])
        kb = jnp.maximum(kmt.astype(jnp.int32) - 1, 1)
        at_kb = levels == kb[None]
        f = f - jnp.where(at_kb, btf[None] * twodt * dztr * aidif
                          * tmask, 0.0)

        # forward sweep (static unroll over km)
        bet = tmask[0] / (b[0] + eps)
        zs = [f[0] * bet]
        es = [jnp.zeros((jmt, imt), f32)]
        for k in range(1, km):
            e_k = c[k - 1] * bet
            bet = tmask[k] / (b[k] - a[k] * e_k + eps)
            zs.append((f[k] - a[k] * zs[-1]) * bet)
            es.append(e_k)
        # back substitution
        for k in range(km - 2, -1, -1):
            zs[k] = zs[k] - es[k + 1] * zs[k + 1]
        t_new = jnp.stack(zs, axis=0)

    out_ref[0] = _setbcx(t_new, lane)


def make_fct_tracer_step(nt, km, jmt, imt, grid_np, ah, aidif,
                         ydiff_fluxform, has_src, dtype=jnp.float32,
                         interpret=False, has_iso=False):
    """Build the fused tracer step.

    grid_np : host bag with numpy grid factors (model.g works)
    Returns fn(t_tau, tm1, vet, vnt, vbt, diff_cbt, stf, btf, source,
               twodt_k, tmask, kmt[, isow]) -> t_new
               [(nt, km, jmt, imt)]
    twodt_k is the runtime (km,) leapfrog interval * dtxcel (traced —
    run_scan selects it per step).
    has_iso: accept an (18, km, jmt, imt) isopycnal weight pack
    (isopyc.iso_weight_pack stacked per _ISO_SLOTS) and apply the
    Redi/GM tendency inside the VMEM pass.
    """
    if has_iso:
        assert ydiff_fluxform, "iso weights require flux-form y-diff"
    g = grid_np

    def np1(x):
        return np.asarray(x, np.float64)

    # static per-level factors, pre-broadcast to (km, 1, imt) so every
    # in-kernel use is a supported sublane broadcast (twodt row filled
    # at call time)
    kfac_static = np.zeros((6, km, 1, imt))
    for row, vec in ((1, np1(g.dzt2r)), (2, np1(g.dztr)),
                     (3, np1(g.dzwr)[1:]), (4, np1(g.dztur)),
                     (5, np1(g.dztlr))):
        kfac_static[row] = np.broadcast_to(vec[:, None, None],
                                           (km, 1, imt))

    jif = np.zeros((6, jmt, imt))
    jif[0] = np1(g.cstdxt2r)
    jif[1] = np.broadcast_to(np1(g.cstdyt2r)[:, None], (jmt, imt))
    jif[2] = np1(g.cstdxtr)
    jif[3] = ah * np1(g.cstdxur)
    if ydiff_fluxform:
        jif[4] = np.broadcast_to(
            (ah * np1(g.csu) * np1(g.dyur))[:, None], (jmt, imt))
        jif[5] = np.broadcast_to(
            (1.0 / (np1(g.cst) * np1(g.dyt)))[:, None], (jmt, imt))
    else:
        jif[4] = np.broadcast_to(np1(g.ahc_north)[:, None], (jmt, imt))
        jif[5] = np.broadcast_to(np1(g.ahc_south)[:, None], (jmt, imt))
    jif = jnp.asarray(jif, dtype)
    kfac_static = jnp.asarray(kfac_static, dtype)

    kern = partial(_kernel, km=km, jmt=jmt, imt=imt, aidif=float(aidif),
                   has_src=bool(has_src),
                   ydiff_fluxform=bool(ydiff_fluxform),
                   has_iso=bool(has_iso))

    full3 = pl.BlockSpec((km, jmt, imt), lambda n: (0, 0, 0))
    per_n4 = pl.BlockSpec((1, km, jmt, imt), lambda n: (n, 0, 0, 0))
    per_n3 = pl.BlockSpec((1, jmt, imt), lambda n: (n, 0, 0))
    full2 = pl.BlockSpec((jmt, imt), lambda n: (0, 0))
    kfac_spec = pl.BlockSpec((6, km, 1, imt), lambda n: (0, 0, 0, 0))
    jif_spec = pl.BlockSpec((6, jmt, imt), lambda n: (0, 0, 0))
    isow_spec = pl.BlockSpec((18, km, jmt, imt), lambda n: (0, 0, 0, 0))

    # the (18, km, jmt, imt) weight pack is only an input when the iso
    # fold is active — a zeros placeholder would still cost a ~14 MB
    # HBM fetch per call otherwise
    if has_iso:
        mid_specs = [isow_spec]
    else:
        mid_specs = [pl.BlockSpec((1, 1, 1, 1), lambda n: (0, 0, 0, 0))]

    call = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[per_n4, per_n4, full3, full3, full3, full3, full3,
                  per_n3, per_n3, per_n4] + mid_specs
        + [kfac_spec, jif_spec, full2],
        out_specs=per_n4,
        out_shape=jax.ShapeDtypeStruct((nt, km, jmt, imt), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def fn(t_tau, tm1, vet, vnt, vbt, diff_cbt, stf, btf, source,
           twodt_k, tmask, kmt, isow=None):
        kfac = kfac_static.at[0].set(
            jnp.broadcast_to(twodt_k.astype(dtype)[:, None, None],
                             (km, 1, imt)))
        if source is None:
            source = jnp.zeros_like(t_tau)
        if isow is None:
            isow = jnp.zeros((1, 1, 1, 1), dtype)
        return call(t_tau.astype(dtype), tm1.astype(dtype),
                    vet.astype(dtype), vnt.astype(dtype),
                    vbt.astype(dtype), tmask.astype(dtype),
                    diff_cbt.astype(dtype), stf.astype(dtype),
                    btf.astype(dtype), source.astype(dtype),
                    isow.astype(dtype), kfac, jif, kmt.astype(dtype))

    return fn
