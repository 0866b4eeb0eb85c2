"""Tracer advective flux schemes: centered, upstream, FCT (Zalesak).

TPU-native re-design of source/mom/tracer_adv_flx.F.  The reference
computes fluxes row-by-row through the memory window; here each scheme is
a whole-domain elementwise graph that XLA fuses into a few kernels.
Flux conventions follow the reference exactly:

- all fluxes are *2x* the physical flux (the 1/2 lives in the metric
  factors cstdxt2r/cstdyt2r/dzt2r, fdift.h:25-39),
- ``fe[.., j, i]`` is the flux across the east face of T cell (i,j),
  ``fn`` the north face, ``fb[k]`` the bottom face of level k; the
  surface face flux is zero (rigid lid, adv_vbt(i,0,j)=0, adv_vel.F:107),
- the advecting velocities may include the GM eddy-induced components
  (tracer_adv_flx.F `totadv`).

The FCT scheme is Zalesak (1979) flux-corrected transport as configured
by default in the reference (O_fct with the dlm1 one-dimensional
delimiters, tracer_adv_flx.F:376-1005): a positive-definite upstream
low-order solution plus direction-split limited antidiffusive fluxes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import EPSLN
from .stencil import DN, E, N, S, UP, W, setbcx


def centered_flux(t_tau, vet, vnt, vbt):
    """2nd-order centered fluxes at tau (tracer_adv_flx.F:1007-1070 and the
    ADV_Ty statement function, fdift.h:34-36)."""
    fe = vet * (t_tau + E(t_tau))
    fn = vnt * (t_tau + N(t_tau))
    fb = vbt * (t_tau + DN(t_tau))   # bottom face of cell k
    fb = fb.at[..., -1, :, :].set(0.0)
    return fe, fn, fb


def upstream_flux(t, vet, vnt, vbt):
    """First-order upstream fluxes (the FCT low-order scheme,
    tracer_adv_flx.F:489-543): v*(a+b) + |v|*(a-b) picks the upwind donor."""
    fe = vet * (t + E(t)) + jnp.abs(vet) * (t - E(t))
    fn = vnt * (t + N(t)) + jnp.abs(vnt) * (t - N(t))
    fb = vbt * (DN(t) + t) + jnp.abs(vbt) * (DN(t) - t)
    fb = fb.at[..., -1, :, :].set(0.0)
    return fe, fn, fb


def quicker_coefficients(grid):
    """Interpolation/curvature weights for the 3rd-order QUICKER scheme
    (grids.F:568-643). Host-side NumPy; returns a dict of arrays."""
    def axis_coeffs(d, cyclic_axis):
        n = len(d)
        ip2 = np.minimum(np.arange(n) + 2, n - 1)
        if cyclic_axis:
            ip2 = np.where(np.arange(n) >= n - 2, 2, np.arange(n) + 2)
            ip2 = np.minimum(ip2, n - 1)
        ip1 = np.minimum(np.arange(n) + 1, n - 1)
        im1 = np.maximum(np.arange(n) - 1, 0)
        dp1 = d[ip1]
        dp2 = d[ip2]
        dm1 = d[im1]
        quick1 = 2.0 * dp1 / (dp1 + d)
        quick2 = 2.0 * d / (dp1 + d)
        cxp1 = 2.0 * d * dp1 / ((dm1 + 2 * d + dp1) * (d + dp1))
        cxp2 = -2.0 * d * dp1 / ((d + dp1) * (dm1 + d))
        cxp3 = 2.0 * d * dp1 / ((dm1 + 2 * d + dp1) * (dm1 + d))
        cxn1 = 2.0 * d * dp1 / ((d + 2 * dp1 + dp2) * (dp1 + dp2))
        cxn2 = -2.0 * d * dp1 / ((dp1 + dp2) * (d + dp1))
        cxn3 = 2.0 * d * dp1 / ((d + 2 * dp1 + dp2) * (d + dp1))
        return dict(q1=quick1, q2=quick2,
                    p1=cxp1, p2=cxp2, p3=cxp3,
                    n1=cxn1, n2=cxn2, n3=cxn3)

    return dict(x=axis_coeffs(np.asarray(grid.dxt), grid.cyclic),
                y=axis_coeffs(np.asarray(grid.dyt), False),
                z=axis_coeffs(np.asarray(grid.dzt), False))


def quicker_flux(t_tau, t_lag, vet, vnt, vbt, tmask, qc):
    """QUICKER 3rd-order advective fluxes (tracer_adv_flx.F:54-249).

    qc: coefficient dict from quicker_coefficients, arrays as jnp
    broadcastable (x coeffs (imt,), y (jmt,1), z (km,1,1)).
    """
    def cx(name):
        return qc["x"][name][None, None, None, :]

    def cy(name):
        return qc["y"][name][None, None, :, None]

    def cz(name):
        return qc["z"][name][None, :, None, None]

    # east face
    upos = 0.5 * (vet + jnp.abs(vet)) * W(tmask) * tmask * E(tmask)
    uneg = 0.5 * (vet - jnp.abs(vet)) * E(E(tmask)) * E(tmask) * tmask
    fe = (vet * (cx("q1") * t_tau + cx("q2") * E(t_tau))
          - upos * (cx("p1") * E(t_lag) + cx("p2") * t_lag
                    + cx("p3") * W(t_lag))
          - uneg * (cx("n1") * E(E(t_lag)) + cx("n2") * E(t_lag)
                    + cx("n3") * t_lag))
    # north face
    vpos = 0.5 * (vnt + jnp.abs(vnt)) * S(tmask) * tmask * N(tmask)
    vneg = 0.5 * (vnt - jnp.abs(vnt)) * N(N(tmask)) * N(tmask) * tmask
    fn = (vnt * (cy("q1") * t_tau + cy("q2") * N(t_tau))
          - vpos * (cy("p1") * N(t_lag) + cy("p2") * t_lag
                    + cy("p3") * S(t_lag))
          - vneg * (cy("n1") * N(N(t_lag)) + cy("n2") * N(t_lag)
                    + cy("n3") * t_lag))
    # bottom face: note the reversed pos/neg-curvature pairing
    # (tracer_adv_flx.F:200-214; k increases downward)
    wpos = 0.5 * (vbt + jnp.abs(vbt)) * DN(DN(tmask)) * DN(tmask) * tmask
    wneg = 0.5 * (vbt - jnp.abs(vbt)) * UP(tmask) * tmask * DN(tmask)
    fb = (vbt * (cz("q1") * t_tau + cz("q2") * DN(t_tau))
          - wneg * (cz("p1") * DN(t_lag) + cz("p2") * t_lag
                    + cz("p3") * UP(t_lag))
          - wpos * (cz("n1") * DN(DN(t_lag)) + cz("n2") * DN(t_lag)
                    + cz("n3") * t_lag))
    fb = fb.at[..., -1, :, :].set(0.0)
    return fe, fn, fb


def _limit(anti, cpos, cneg):
    """Apply directional limiter: cpos where flux > 0, cneg where < 0
    (tracer_adv_flx.F:700-705 branch-free form)."""
    return 0.5 * ((cpos + cneg) * anti + (cpos - cneg) * jnp.abs(anti))


def fct_flux(t_tau, t_tm1, vet, vnt, vbt, tmask, c2dtts_k,
             cstdxt2r, cstdyt2r, dzt2r, cyclic=True,
             variant="dlm1", fct3d=False):
    """Zalesak FCT fluxes (tracer_adv_flx.F:376-1005).

    t_tau, t_tm1 : (km, jmt, imt) tracer at tau and tau-1
    vet/vnt/vbt  : total advective velocities (incl. GM if enabled)
    c2dtts_k     : (km,1,1) leapfrog interval x dtxcel acceleration
    cstdxt2r     : (jmt, imt); cstdyt2r: (jmt,1); dzt2r: (km,1,1)
    variant      : "dlm1" — extrema from halfway tau means (O_fct_dlm1)
                   "dlm2" — extrema from the low-order neighbor
                   solution (O_fct_dlm2, tracer_adv_flx.F:659-666)
    fct3d        : apply the additional 3-D delimiter coupling all
                   directions after the 1-D passes (O_fct_3d,
                   tracer_adv_flx.F:880-977)
    returns (fe, fn, fb) corrected 2x-fluxes.
    """
    tmaski = 1.0 - tmask

    # low-order upstream fluxes at tau-1
    fe_lo, fn_lo, fb_lo = upstream_flux(t_tm1, vet, vnt, vbt)

    # low-order solution
    adv_tx = (fe_lo - W(fe_lo)) * cstdxt2r
    adv_ty = (fn_lo - S(fn_lo)) * cstdyt2r
    adv_tz = (UP(fb_lo) - fb_lo) * dzt2r
    t_lo = t_tm1 - c2dtts_k * (adv_tx + adv_ty + adv_tz) * tmask
    t_lo = setbcx(t_lo, cyclic)

    # raw antidiffusive fluxes: high-order leapfrog (tau) minus low-order
    anti_fe = vet * (t_tau + E(t_tau)) - fe_lo
    anti_fn = vnt * (t_tau + N(t_tau)) - fn_lo
    anti_fb = vbt * (t_tau + DN(t_tau)) - fb_lo * tmask
    anti_fb = anti_fb.at[..., -1, :, :].set(0.0)

    def ratios(trmax, trmin, p_plus, p_minus):
        q_plus = trmax - t_lo
        q_minus = t_lo - trmin
        rpl = jnp.minimum(1.0, tmask * q_plus / (p_plus + EPSLN))
        rmn = jnp.minimum(1.0, tmask * q_minus / (p_minus + EPSLN))
        return rpl, rmn

    dlm2 = variant == "dlm2"

    # ---- x-direction delimiter ---------------------------------------
    if dlm2:
        fxa = W(tmask) * W(t_lo) + W(tmaski) * t_lo
        fxb = E(tmask) * E(t_lo) + E(tmaski) * t_lo
    else:
        halfway = 0.5 * (W(t_tau) + t_tau)      # value at west face
        fxa = W(tmask) * halfway + W(tmaski) * t_lo
        fxb = E(tmask) * E(halfway) + E(tmaski) * t_lo
    trmax_x = jnp.maximum(jnp.maximum(fxa, fxb), t_lo)
    trmin_x = jnp.minimum(jnp.minimum(fxa, fxb), t_lo)
    dcf = c2dtts_k * cstdxt2r
    p_plus = dcf * (jnp.maximum(0.0, W(anti_fe)) - jnp.minimum(0.0, anti_fe))
    p_minus = dcf * (jnp.maximum(0.0, anti_fe) - jnp.minimum(0.0, W(anti_fe)))
    rpl, rmn = ratios(trmax_x, trmin_x, p_plus, p_minus)
    rpl, rmn = setbcx(rpl, cyclic), setbcx(rmn, cyclic)
    cpos = jnp.minimum(E(rpl), rmn)             # at east face of cell
    cneg = jnp.minimum(rpl, E(rmn))
    anti_fe = _limit(anti_fe, cpos, cneg)

    # ---- y-direction delimiter ---------------------------------------
    if dlm2:
        fxa = S(tmask) * S(t_lo) + S(tmaski) * t_lo
        fxb = N(tmask) * N(t_lo) + N(tmaski) * t_lo
    else:
        hw_s = 0.5 * (S(t_tau) + t_tau)         # halfway to south neighbor
        hw_n = 0.5 * (t_tau + N(t_tau))
        fxa = S(tmask) * hw_s + S(tmaski) * t_lo
        fxb = N(tmask) * hw_n + N(tmaski) * t_lo
    trmax_y = jnp.maximum(jnp.maximum(fxa, fxb), t_lo)
    trmin_y = jnp.minimum(jnp.minimum(fxa, fxb), t_lo)
    dcf = c2dtts_k * cstdyt2r
    p_plus = dcf * (jnp.maximum(0.0, S(anti_fn)) - jnp.minimum(0.0, anti_fn))
    p_minus = dcf * (jnp.maximum(0.0, anti_fn) - jnp.minimum(0.0, S(anti_fn)))
    rply, rmny = ratios(trmax_y, trmin_y, p_plus, p_minus)
    cpos = jnp.minimum(N(rply), rmny)           # at north face of cell
    cneg = jnp.minimum(rply, N(rmny))
    anti_fn = _limit(anti_fn, cpos, cneg)

    # ---- z-direction delimiter ---------------------------------------
    if dlm2:
        fxa = UP(tmask) * UP(t_lo) + UP(tmaski) * t_lo
        fxb = DN(tmask) * DN(t_lo) + DN(tmaski) * t_lo
    else:
        hw_up = 0.5 * (UP(t_tau) + t_tau)       # halfway to level above
        hw_dn = 0.5 * (t_tau + DN(t_tau))
        fxa = UP(tmask) * hw_up + UP(tmaski) * t_lo
        fxb = DN(tmask) * hw_dn + DN(tmaski) * t_lo
    fxa = fxa.at[..., 0, :, :].set(t_lo[..., 0, :, :])
    fxb = fxb.at[..., -1, :, :].set(t_lo[..., -1, :, :])
    trmax_z = jnp.maximum(jnp.maximum(fxa, fxb), t_lo)
    trmin_z = jnp.minimum(jnp.minimum(fxa, fxb), t_lo)
    dcf = c2dtts_k * dzt2r
    # for cell k: left flux = bottom face (k), right flux = top face (k-1)
    p_plus = dcf * (jnp.maximum(0.0, anti_fb)
                    - jnp.minimum(0.0, UP(anti_fb)))
    p_minus = dcf * (jnp.maximum(0.0, UP(anti_fb))
                     - jnp.minimum(0.0, anti_fb))
    rplz, rmnz = ratios(trmax_z, trmin_z, p_plus, p_minus)
    # face k lies between cells k (above) and k+1 (below)
    cneg = jnp.minimum(DN(rplz), rmnz)
    cpos = jnp.minimum(rplz, DN(rmnz))
    anti_fb = _limit(anti_fb, cpos, cneg)
    anti_fb = anti_fb.at[..., -1, :, :].set(0.0)

    # ---- 3-D delimiter on the pre-corrected fluxes (O_fct_3d,
    # tracer_adv_flx.F:880-977): extrema over all directions, P sums
    # all incoming/outgoing antidiffusive fluxes ----------------------
    if fct3d:
        tr3max = jnp.maximum(jnp.maximum(trmax_x, trmax_y), trmax_z)
        tr3min = jnp.minimum(jnp.minimum(trmin_x, trmin_y), trmin_z)
        q_plus = tr3max - t_lo
        q_minus = t_lo - tr3min
        den_p = EPSLN + c2dtts_k * (
            cstdxt2r * (jnp.maximum(0.0, W(anti_fe))
                        - jnp.minimum(0.0, anti_fe))
            + cstdyt2r * (jnp.maximum(0.0, S(anti_fn))
                          - jnp.minimum(0.0, anti_fn))
            + dzt2r * (jnp.maximum(0.0, anti_fb)
                       - jnp.minimum(0.0, UP(anti_fb))))
        den_m = EPSLN + c2dtts_k * (
            cstdxt2r * (jnp.maximum(0.0, anti_fe)
                        - jnp.minimum(0.0, W(anti_fe)))
            + cstdyt2r * (jnp.maximum(0.0, anti_fn)
                          - jnp.minimum(0.0, S(anti_fn)))
            + dzt2r * (jnp.maximum(0.0, UP(anti_fb))
                       - jnp.minimum(0.0, anti_fb)))
        r3p = setbcx(jnp.minimum(1.0, tmask * q_plus / den_p), cyclic)
        r3m = setbcx(jnp.minimum(1.0, tmask * q_minus / den_m), cyclic)
        anti_fe = _limit(anti_fe, jnp.minimum(E(r3p), r3m),
                         jnp.minimum(r3p, E(r3m)))
        anti_fn = _limit(anti_fn, jnp.minimum(N(r3p), r3m),
                         jnp.minimum(r3p, N(r3m)))
        anti_fb = _limit(anti_fb, jnp.minimum(r3p, DN(r3m)),
                         jnp.minimum(DN(r3p), r3m))
        anti_fb = anti_fb.at[..., -1, :, :].set(0.0)

    # ---- corrected totals --------------------------------------------
    fe = anti_fe + fe_lo
    fn = (anti_fn + fn_lo) * tmask
    fb = (anti_fb + fb_lo) * tmask
    return fe, fn, fb
