"""Pore-water CaCO3 diagenesis columns (Archer 1996; sed/sediment.F).

Full TPU-native redesign of the reference sediment chemistry: where
sediment.F solves each sediment column's coupled (CO2, HCO3, CO3)
pore-water system with a banded LU (my_sgbfa/my_sgbsl, sediment.F:
2028-2326) over an irregular `ipmax` site list, here EVERY ocean-bottom
cell carries a 7-level sediment column as dense (kmax, jmt, imt)
fields and the Newton iteration solves a batched block-tridiagonal
system (3x3 blocks, vectorized block-Thomas) — the whole seafloor in
one fused device program.

Pieces and their sources:
- grid: kmax=7, delz=[0,.5,.5,1,2,3,3] cm, dissc=1.1574e-5/s, n=4.5
  (setsed.F:82-91); level 1 is the bottom-water boundary cell,
- porosity/formation factor: set_pore (sediment.F:200-222),
  pore_2_form = pore^3 (sediment.F:1596-1615),
- diffusion operators: calc_do2/calc_dc/calc_db
  (sediment.F:1051-1092, 1381-1430, 1548-1594),
- organic carbon + O2: orgc/o2ss tridiagonal steady states with the
  oxygen-penetration depth update (o2org, sediment.F:638-1050),
- pore-water carbonate Newton: co3 residuals/Jacobian
  (sediment.F:1667-1995) with the 75%-step damping
  (sediment.F:1900-1960) and the Keir/Archer rate law
  cal_c = dissc*(1-CO3/csat)^n*(1-pore)*calgg*25 (sediment.F:1973),
- interface fluxes: sed_diag (sediment.F:1433-1530),
- bottom-water chemistry: calc_k (Mehrbach + pressure) and the
  alkalinity iteration calc_buff (sediment.F:517-637),
- driver cadence: sed.F n_control=2 (steady pore water at constant
  calcite, then mixed-layer mass update).

Documented divergences: the buried-stack history (bury,
sediment.F:2-199, depth_age bookkeeping) is collapsed to a bulk
buried-mass accumulator per column (total carbon is conserved); loop
counts are fixed (Newton 60, org/O2 12) instead of data-dependent
early exits — converged columns simply take zero-size steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

KMAX = 7
DELZ = np.array([0.0, 0.5, 0.5, 1.0, 2.0, 3.0, 3.0])   # cm
ZSED = np.cumsum(DELZ)
DISSC = 1.1574e-5       # dissolution rate [1/s] (setsed.F:90)
DISSN = 4.5
DB = 0.15               # bioturbation [cm^2/yr] (sediment.F:1568)
DIFO2 = 12.0e-6         # [cm^2/s] (calc_do2 overrides to 12e-6)
DIFC = (10.5e-6, 6.4e-6, 5.2e-6)
EXPB = 3.0
SEC_PER_YR = 3.15e7
RAINCAL_CUTOFF = 0.1e-6  # mol/cm^2/yr (calss:1131)


@struct.dataclass
class PoreWaterState:
    calgg: jnp.ndarray      # (KMAX, jmt, imt) calcite mass fraction
    orggg: jnp.ndarray      # organic carbon mass fraction
    carb: jnp.ndarray       # (3, KMAX, jmt, imt) CO2/HCO3/CO3 [mol/l]
    o2: jnp.ndarray         # (KMAX, jmt, imt) pore-water O2 [mol/l]
    zrct: jnp.ndarray       # (jmt, imt) O2 penetration depth [cm]
    buried: jnp.ndarray     # cumulative burial [mol CaCO3/cm^2]
    buried_org: jnp.ndarray


def init_porewater(jmt, imt, dtype=np.float64):
    z2 = jnp.zeros((jmt, imt), dtype)
    zk = jnp.zeros((KMAX, jmt, imt), dtype)
    carb = jnp.stack([zk + 2.0e-5, zk + 1.8e-3, zk + 9.0e-5])
    return PoreWaterState(
        calgg=zk + 0.5, orggg=zk + 0.003, carb=carb,
        o2=zk + 1.5e-4, zrct=z2 + ZSED[-1], buried=z2,
        buried_org=z2)


# ----------------------------------------------------------------------
# bottom-water chemistry (sediment.F:517-637)
# ----------------------------------------------------------------------
def calc_k(temp, sal, depth_m):
    """Mehrbach K1/K2 + Lyman KB with pressure ratios, and the Sayles
    calcite saturation CO3 [mol/l] (calc_k, sediment.F:517-585)."""
    tk = temp + 273.15
    s = jnp.maximum(sal, 1.0)
    k1 = 10.0 ** (13.7201 - 0.031334 * tk - 3235.76 / tk
                  - 1.3e-5 * s * tk + 0.1032 * jnp.sqrt(s))
    cp = (depth_m / 10.0) / 83.143 / tk
    k1 = k1 * jnp.exp((24.2 - 0.085 * temp) * cp)
    ln10 = 2.30259
    k2 = 10.0 ** (-5371.9645 - 1.671221 * tk + 128375.28 / tk
                  + 2194.3055 * jnp.log(tk) / ln10 - 0.22913 * s
                  - 18.3802 * jnp.log(s) / ln10
                  + 8.0944e-4 * s * tk
                  + 5617.11 * jnp.log(s) / tk / ln10 - 2.136 * s / tk)
    k2 = k2 * jnp.exp((16.4 - 0.04 * temp) * cp)
    kb = 10.0 ** -(2291.9 / tk + 0.01756 * tk - 3.385
                   - 0.32051 * (s / 1.80655) ** (1.0 / 3.0))
    kb = kb * jnp.exp((27.5 - 0.095 * temp) * cp)
    # Sayles: Ksp(P)/[Ca] with [Ca]=0.01 mol/l
    pres = depth_m / 10.0
    rr = 83.14
    kpres = jnp.log(4.75e-7) + 44.0 / (rr * tk) * pres \
        + 0.5 * (-0.0133) / (rr * tk) * pres ** 2
    csat = jnp.exp(kpres) / 0.01
    return k1, k2, kb, csat


def calc_buff(alk, tco2, sal, k1, k2, kb, n_iter=50):
    """Bottom-water CO2/HCO3/CO3 from ALK/TCO2 (calc_buff,
    sediment.F:589-637), all mol/l."""
    tbor = 4.106e-4 * sal / 35.0
    c1 = k1 / 2.0
    c2 = 1.0 - 4.0 * k2 / k1
    c4 = tbor * kb
    tco2 = jnp.maximum(tco2, 1e-6)

    def body(_, aht):
        a = alk - c4 / (kb + aht)
        x = a / tco2
        return c1 / x * (1.0 - x + jnp.sqrt(jnp.maximum(
            1.0 + c2 * x * (-2.0 + x), 0.0)))

    ah1 = jax.lax.fori_loop(0, n_iter, body,
                            jnp.full_like(alk, 0.74e-8))
    a = alk - c4 / (kb + ah1)
    co3 = (a - tco2) / (1.0 - ah1 * ah1 / (k1 * k2))
    hco3 = tco2 / (1.0 + ah1 / k1 + k2 / ah1)
    co2 = tco2 / (1.0 + k1 / ah1 + k1 * k2 / (ah1 * ah1))
    return co2, hco3, co3


# ----------------------------------------------------------------------
# static column operators
# ----------------------------------------------------------------------
def _set_pore(calgg_bot):
    """Porosity profile from the deep calcite fraction (set_pore)."""
    pore_max = 1.0 - (0.483 + 0.45 * calgg_bot) / 2.5
    exp_pore = 0.25 * calgg_bot + 3.0 * (1.0 - calgg_bot)
    z = jnp.asarray(ZSED, calgg_bot.dtype)[:, None, None]
    pore = jnp.exp(-z / exp_pore[None]) * (1.0 - pore_max[None]) \
        + pore_max[None]
    return pore


def _face_ops(coef, form, pore, harmonic=False):
    """(dplus, dminus) second-difference operators (calc_dc/calc_do2):
    dplus(k) multiplies (x(k+1)-x(k)), dminus(k) multiplies
    (x(k)-x(k-1)); top face of level 2 exchanges with the bottom-water
    boundary (form=1 there)."""
    km = KMAX
    dplus = jnp.zeros_like(form)
    dminus = jnp.zeros_like(form)
    for i in range(2, km - 1):
        num_p = (form[i + 1] + form[i]) * 0.5 if not harmonic else \
            (DELZ[i] * form[i + 1] + DELZ[i + 1] * form[i]) \
            / (DELZ[i] + DELZ[i + 1])
        num_m = (form[i - 1] + form[i]) * 0.5 if not harmonic else \
            (DELZ[i] * form[i - 1] + DELZ[i - 1] * form[i]) \
            / (DELZ[i] + DELZ[i - 1])
        dplus = dplus.at[i].set(
            coef * num_p / pore[i]
            * 2.0 / ((DELZ[i + 1] + DELZ[i]) * DELZ[i]))
        dminus = dminus.at[i].set(
            coef * num_m / pore[i]
            * 2.0 / ((DELZ[i - 1] + DELZ[i]) * DELZ[i]))
    i = KMAX - 1
    num_m = (form[i - 1] + form[i]) * 0.5 if not harmonic else \
        (DELZ[i] * form[i - 1] + DELZ[i - 1] * form[i]) \
        / (DELZ[i] + DELZ[i - 1])
    dminus = dminus.at[i].set(
        coef * num_m / pore[i]
        * 2.0 / ((DELZ[i - 1] + DELZ[i]) * DELZ[i]))
    i = 1
    num_p = (form[i + 1] + form[i]) * 0.5 if not harmonic else \
        (DELZ[i] * form[i + 1] + DELZ[i + 1] * form[i]) \
        / (DELZ[i] + DELZ[i + 1])
    dplus = dplus.at[i].set(
        coef * num_p / pore[i]
        * 2.0 / ((DELZ[i + 1] + DELZ[i]) * DELZ[i]))
    dminus = dminus.at[i].set(
        coef * (form[i] + 1.0) * 0.5 / pore[i] / DELZ[i] ** 2)
    return dplus, dminus


def _db_ops(pore):
    """Bioturbation operators (calc_db, sediment.F:1548-1594),
    db in cm^2/yr."""
    dbpls = jnp.zeros_like(pore)
    dbmin = jnp.zeros_like(pore)
    for k in range(2, KMAX - 1):
        dbpls = dbpls.at[k].set(
            DB * 2.0 / ((DELZ[k] + DELZ[k + 1]) * DELZ[k])
            * (2.0 - pore[k] - pore[k + 1]) / (1.0 - pore[k]))
        dbmin = dbmin.at[k].set(
            DB * 2.0 / ((DELZ[k] + DELZ[k - 1]) * DELZ[k])
            * (2.0 - pore[k] - pore[k - 1]) / (1.0 - pore[k]))
    k = 1
    dbpls = dbpls.at[k].set(
        DB * 2.0 / ((DELZ[k] + DELZ[k + 1]) * DELZ[k])
        * (2.0 - pore[k] - pore[k + 1]) / (1.0 - pore[k]))
    k = KMAX - 1
    dbmin = dbmin.at[k].set(
        DB * 2.0 / ((DELZ[k] + DELZ[k - 1]) * DELZ[k])
        * (2.0 - pore[k] - pore[k - 1]) / (1.0 - pore[k]))
    return dbpls, dbmin


def _tridiag(a, b, c, r):
    """Batched Thomas solve along axis 0: a lower, b diag, c upper,
    each (n, ...); mirrors sediment.F tridiag."""
    n = a.shape[0]

    def fwd(carry, xs):
        bet, u_prev = carry
        a_k, b_k, c_km1, r_k = xs
        gam = c_km1 / bet
        bet_new = b_k - a_k * gam
        u_new = (r_k - a_k * u_prev) / bet_new
        return (bet_new, u_new), (u_new, gam)

    c_shift = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], 0)
    bet0 = b[0]
    u0 = r[0] / bet0
    (_, _), (us, gams) = jax.lax.scan(
        fwd, (bet0, u0), (a[1:], b[1:], c_shift[1:], r[1:]))
    u_all = jnp.concatenate([u0[None], us], 0)
    gam_all = jnp.concatenate([jnp.zeros_like(gams[:1]), gams], 0)

    def bwd(u_next, xs):
        u_k, gam_kp1 = xs
        u_new = u_k - gam_kp1 * u_next
        return u_new, u_new

    gam_next = jnp.concatenate([gam_all[1:], jnp.zeros_like(
        gam_all[:1])], 0)
    _, rev = jax.lax.scan(bwd, u_all[-1],
                          (u_all[:-1][::-1], gam_next[:-1][::-1]))
    return jnp.concatenate([rev[::-1], u_all[-1:]], 0)


# ----------------------------------------------------------------------
# organic carbon + O2 (o2org, sediment.F:638-1050)
# ----------------------------------------------------------------------
def _react_gate(zrct):
    """Per-level reaction weight: 1 fully above the O2 penetration
    depth, fractional in the crossing level, 0 below (get_resp)."""
    z = ZSED[:, None, None]
    zm1 = np.concatenate([[0.0], ZSED[:-1]])[:, None, None]
    full = (z <= zrct[None]).astype(zrct.dtype)
    frac = jnp.clip((zrct[None] - zm1) / jnp.maximum(z - zm1, 1e-12),
                    0.0, 1.0)
    return jnp.where(z <= zrct[None], full, frac * (zm1 <= zrct[None]))


def _orgc_o2(rain_org, rc, pore, form, o2_bw, zrct0, orggg0,
             n_outer=12):
    """Coupled organic-carbon / O2 steady state (o2org).  rain_org in
    mol C/cm^2/yr; rc [1/s]; returns (orggg, orgml, o2, zrct,
    resp_c1) with resp_c1 the TCO2 respiration source
    [mol/l-porewater/s] per level."""
    dbpls, dbmin = _db_ops(pore)                   # per year
    dopls, domin = _face_ops(DIFO2, form, pore)    # per second
    lvl_mask = np.ones((KMAX, 1, 1))
    lvl_mask[0] = 0.0
    lvl_mask = jnp.asarray(lvl_mask, pore.dtype)

    def outer(_, carry):
        orggg, o2, zrct = carry
        gate = _react_gate(zrct)
        # ---- orgc Newton step (linear solve; equations are linear in
        # orggg for fixed gate) ----------------------------------------
        dreac = -rc * SEC_PER_YR * gate * lvl_mask
        react = dreac * orggg
        rain_src = jnp.zeros_like(orggg).at[1].set(
            rain_org * 12.0 / DELZ[1] / (1.0 - pore[1]) / 2.5)
        up = jnp.concatenate([orggg[1:], orggg[-1:]], 0)
        dn = jnp.concatenate([orggg[:1], orggg[:-1]], 0)
        res = dbpls * (up - orggg) - dbmin * (orggg - dn) \
            + react + rain_src
        # boundary rows: level 1 has no dminus term, level KMAX-1 no
        # dbpls (already zero in the operators)
        res = res.at[1].set(dbpls[1] * (orggg[2] - orggg[1])
                            + react[1] + rain_src[1])
        res = res.at[-1].set(-dbmin[-1] * (orggg[-1] - orggg[-2])
                             + react[-1])
        a = dbmin[1:]
        b = (-dbpls - dbmin + dreac)[1:]
        b = b.at[0].set((-dbpls + dreac)[1])
        b = b.at[-1].set((-dbmin + dreac)[-1])
        c = dbpls[1:]
        du = _tridiag(a, b, c, -res[1:])
        orggg = jnp.clip(orggg.at[1:].add(du), 0.0, 1.0)
        orgml = orggg * 2.5 * (1.0 - pore) * 1000.0 / 12.0

        # ---- o2 steady state (linear solve) ---------------------------
        sink = 1.3 * rc * orgml / pore * gate * lvl_mask
        a2 = domin[1:]
        b2 = (-dopls - domin)[1:]
        b2 = b2.at[-1].set(-domin[-1])
        c2 = dopls[1:]
        # residual with o2(1) = bottom water as Dirichlet via dn term
        up2 = jnp.concatenate([o2[1:], o2[-1:]], 0)
        dn2 = jnp.concatenate([o2[:1], o2[:-1]], 0)
        res2 = dopls * (up2 - o2) - domin * (o2 - dn2) - sink
        res2 = res2.at[-1].set(-domin[-1] * (o2[-1] - o2[-2])
                               - sink[-1])
        du2 = _tridiag(a2, b2, c2, -res2[1:])
        o2 = o2.at[1:].add(du2)
        o2 = o2.at[0].set(o2_bw)
        # O2 penetration depth update (o2org, sediment.F:683-687)
        zrct = jnp.minimum(
            ZSED[-1], zrct * o2[0] / (o2[0] - o2[-1] + 1e-20))
        zrct = jnp.maximum(zrct, 0.1)
        return orggg, o2, zrct

    orggg, o2, zrct = jax.lax.fori_loop(
        0, n_outer, outer, (orggg0, jnp.zeros_like(orggg0)
                            + o2_bw[None] * 0.5, zrct0))
    gate = _react_gate(zrct)
    orgml = orggg * 2.5 * (1.0 - pore) * 1000.0 / 12.0
    resp_c1 = rc * orgml * gate * jnp.asarray(
        np.concatenate([[0.0], np.ones(KMAX - 1)])[:, None, None],
        orggg.dtype)
    return orggg, orgml, o2, zrct, resp_c1


# ----------------------------------------------------------------------
# pore-water carbonate Newton (co3, sediment.F:1667-1995)
# ----------------------------------------------------------------------
def _block_thomas(L, D, U, R):
    """Block-tridiagonal solve with 3x3 blocks.

    L/D/U : (n, 3, 3, ...) lower/diag/upper blocks
    R     : (n, 3, ...)
    The batch dims trail; einsum contracts the 3x3 blocks.
    """
    def minv3(m):
        # explicit 3x3 inverse (adjugate/det), batched
        a, b, c = m[0, 0], m[0, 1], m[0, 2]
        d, e, f = m[1, 0], m[1, 1], m[1, 2]
        g, h, i = m[2, 0], m[2, 1], m[2, 2]
        A = e * i - f * h
        B = -(d * i - f * g)
        C = d * h - e * g
        det = a * A + b * B + c * C
        det = jnp.where(jnp.abs(det) < 1e-300,
                        jnp.sign(det) * 1e-300 + 1e-300, det)
        inv = jnp.stack([
            jnp.stack([A, -(b * i - c * h), b * f - c * e]),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)]),
            jnp.stack([C, -(a * h - b * g), a * e - b * d])])
        return inv / det

    def mm(x, y):
        return jnp.einsum("ab...,bc...->ac...", x, y)

    def mv(x, v):
        return jnp.einsum("ab...,b...->a...", x, v)

    def fwd(carry, xs):
        dprime, rprime = carry
        L_k, D_k, U_km1, R_k = xs
        inv = minv3(dprime)
        gam = mm(inv, U_km1)
        dnew = D_k - mm(L_k, gam)
        rnew = R_k - mv(L_k, mv(inv, rprime))
        return (dnew, rnew), (gam, rnew, dnew)

    n = R.shape[0]
    U_shift = jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], 0)
    (_, _), (gams, rps, dps) = jax.lax.scan(
        fwd, (D[0], R[0]), (L[1:], D[1:], U_shift[1:], R[1:]))
    d_all = jnp.concatenate([D[:1], dps], 0)
    r_all = jnp.concatenate([R[:1], rps], 0)
    gam_all = jnp.concatenate([jnp.zeros_like(gams[:1]), gams], 0)

    x_n = mv(minv3(d_all[-1]), r_all[-1])

    def bwd(x_next, xs):
        d_k, r_k, gam_kp1 = xs
        x_k = mv(minv3(d_k), r_k) - mv(gam_kp1, x_next)
        return x_k, x_k

    gam_next = jnp.concatenate([gam_all[1:],
                                jnp.zeros_like(gam_all[:1])], 0)
    _, rev = jax.lax.scan(
        bwd, x_n, (d_all[:-1][::-1], r_all[:-1][::-1],
                   gam_next[:-1][::-1]))
    return jnp.concatenate([rev[::-1], x_n[None]], 0)


def _co3_newton(carb0, resp_c1, calgg, pore, form, csat, k1, k2,
                n_iter=60):
    """Newton iteration for the (CO2, HCO3, CO3) pore-water profiles
    (co3/co3ss).  carb0: (3, KMAX, ...) with level 0 the fixed
    bottom-water boundary.  Returns (carb, cal_c)."""
    dc = [None] * 3
    for j in range(3):
        dc[j] = _face_ops(DIFC[j], form, pore, harmonic=True)
    dplus = jnp.stack([dc[j][0] for j in range(3)])   # (3, KMAX, ...)
    dminus = jnp.stack([dc[j][1] for j in range(3)])
    keq = k2 / k1
    diss_fac = (1.0 - pore) / pore * 25.0             # *(2.5*1000)/100

    def cal_rate(co3):
        under = jnp.maximum(1.0 - co3 / csat[None], 0.0)
        return DISSC * under ** DISSN

    def body(_, carb):
        co2, hco3, co3 = carb[0], carb[1], carb[2]
        up = jnp.concatenate([carb[:, 1:], carb[:, -1:]], 1)
        dn = jnp.concatenate([carb[:, :1], carb[:, :-1]], 1)
        lap = dplus * (up - carb) - dminus * (carb - dn)
        # no-flux bottom boundary: carb(kmax+1) = carb(kmax) handled by
        # the `up` clamp; dplus at kmax already zero
        diss = cal_rate(co3) * diss_fac * calgg
        ddiss = jnp.where(
            co3 < csat[None],
            -DISSC * DISSN / csat[None]
            * jnp.maximum(1.0 - co3 / csat[None], 0.0) ** (DISSN - 1.0)
            * diss_fac * calgg, 0.0)
        r1 = lap[0] + lap[1] + lap[2] + resp_c1 / pore + diss
        r2 = lap[2] + 0.5 * lap[1] + diss
        r3 = co2 * co3 / jnp.maximum(hco3, 1e-12) ** 2 - keq

        n = KMAX - 1   # unknown levels 1..KMAX-1
        sl = slice(1, KMAX)
        zero = jnp.zeros_like(co2[sl])

        def blocks(drow_dco2, drow_dhco3, drow_dco3):
            return drow_dco2, drow_dhco3, drow_dco3

        # diagonal blocks (function x variable) at each unknown level
        d11 = (-dplus[0] - dminus[0])[sl]
        d12 = (-dplus[1] - dminus[1])[sl]
        d13 = (-dplus[2] - dminus[2])[sl] + ddiss[sl]
        d22 = 0.5 * (-dplus[1] - dminus[1])[sl]
        d23 = (-dplus[2] - dminus[2])[sl] + ddiss[sl]
        d31 = (co3 / jnp.maximum(hco3, 1e-12) ** 2)[sl]
        d32 = (-2.0 * co2 * co3 / jnp.maximum(hco3, 1e-12) ** 3)[sl]
        d33 = (co2 / jnp.maximum(hco3, 1e-12) ** 2)[sl]
        D = jnp.stack([jnp.stack([d11, d12, d13]),
                       jnp.stack([zero, d22, d23]),
                       jnp.stack([d31, d32, d33])], 0)
        D = jnp.moveaxis(D, 2, 0)            # (n, 3, 3, ...)
        # lower blocks: dminus terms couple to level k-1
        l11 = dminus[0][sl]
        l12 = dminus[1][sl]
        l13 = dminus[2][sl]
        l22 = 0.5 * dminus[1][sl]
        l23 = dminus[2][sl]
        L = jnp.stack([jnp.stack([l11, l12, l13]),
                       jnp.stack([zero, l22, l23]),
                       jnp.stack([zero, zero, zero])], 0)
        L = jnp.moveaxis(L, 2, 0)
        # upper blocks: dplus terms couple to level k+1
        u11 = dplus[0][sl]
        u12 = dplus[1][sl]
        u13 = dplus[2][sl]
        u22 = 0.5 * dplus[1][sl]
        u23 = dplus[2][sl]
        U = jnp.stack([jnp.stack([u11, u12, u13]),
                       jnp.stack([zero, u22, u23]),
                       jnp.stack([zero, zero, zero])], 0)
        U = jnp.moveaxis(U, 2, 0)
        # bottom boundary (no flux): fold the would-be upper coupling
        # of the last row into its diagonal (co3:1880-1885)
        D = D.at[-1].add(U[-1])
        U = U.at[-1].set(0.0)
        # level-1 lower block couples to the FIXED boundary level 0 —
        # drop it from the unknown system (Dirichlet)
        L = L.at[0].set(0.0)

        R = -jnp.stack([r1[sl], r2[sl], r3[sl]], 1)   # (n, 3, ...)
        dx = _block_thomas(L, D, U, R)                # (n, 3, ...)
        dx = jnp.moveaxis(dx, 1, 0)                   # (3, n, ...)

        # 75%-step damping per column (co3:1900-1935)
        def wlimit(x, d):
            tw = -0.75 * x / (d + 1e-20)
            return jnp.where((tw > 0.0) & (tw < 1.0), tw, 1.0)

        w = jnp.minimum(
            jnp.min(wlimit(carb[2, sl], dx[2]), axis=0),
            jnp.min(wlimit(carb[0, sl], dx[0]), axis=0))
        carb = carb.at[:, sl].add(dx * w[None, None])
        carb = jnp.maximum(carb, 1e-12)
        return carb

    carb = jax.lax.fori_loop(0, n_iter, body, carb0)
    cal_c = cal_rate(carb[2]) * (1.0 - pore) * calgg * 25.0
    # [mol/l-total/s] (sediment.F:1973 without the /pore factor)
    return carb, cal_c


# ----------------------------------------------------------------------
# the per-dtsed driver (sed.F n_control=2)
# ----------------------------------------------------------------------
def porewater_step(state: PoreWaterState, temp, sal, alk_bw, tco2_bw,
                   o2_bw, rain_cal, rain_org, depth_m, ocean_mask,
                   dtsed_s):
    """One sediment coupling step over all bottom cells.

    temp/sal : bottom-water T [C], S [psu]
    alk_bw/tco2_bw : [mol/l] bottom water
    o2_bw   : [mol/l]
    rain_cal/rain_org : [mol/cm^2/s] particle rain
    depth_m : (jmt, imt) water depth [m]
    Returns (new_state, fluxes) with dic/alk/o2 fluxes to the bottom
    water [umol/cm^2/s, positive into the ocean] and burial rate.
    """
    dt_yr = dtsed_s / SEC_PER_YR
    rain_cal_y = rain_cal * SEC_PER_YR          # mol/cm^2/yr
    rain_org_y = rain_org * SEC_PER_YR

    k1, k2, kb, csat = calc_k(temp, sal, depth_m)
    co2_bw, hco3_bw, co3_bw = calc_buff(alk_bw, tco2_bw,
                                        jnp.maximum(sal, 1.0),
                                        k1, k2, kb)
    carb = state.carb
    carb = carb.at[0, 0].set(co2_bw).at[1, 0].set(hco3_bw) \
        .at[2, 0].set(co3_bw)

    pore = _set_pore(state.calgg[-1])
    form = pore ** EXPB
    rc = jnp.full_like(temp, 2.0e-9)            # estimate_rc

    orggg, orgml, o2, zrct, resp_c1 = _orgc_o2(
        rain_org_y, rc, pore, form, jnp.maximum(o2_bw, 1e-6),
        state.zrct, state.orggg)

    carb, cal_c = _co3_newton(carb, resp_c1, state.calgg, pore, form,
                              csat, k1, k2)

    # interface fluxes (sed_diag): total dissolution and respiration
    # [mol/cm^2/yr]
    delz = jnp.asarray(DELZ, temp.dtype)[:, None, None]
    ttrcal = jnp.sum(cal_c * delz, axis=0) * SEC_PER_YR / 1.0e3
    ttrorg = jnp.sum(resp_c1 * delz, axis=0) * SEC_PER_YR / 1.0e3
    # dissolution cannot exceed rain plus the standing mixed-layer
    # stock this step (mass positivity)
    pore0 = _set_pore(state.calgg[-1])
    stock = jnp.sum(state.calgg * jnp.asarray(
        DELZ, temp.dtype)[:, None, None] * (1.0 - pore0) * 2.5,
        axis=0) / 100.0                       # mol CaCO3/cm^2
    ttrcal = jnp.minimum(ttrcal, rain_cal_y
                         + stock / jnp.maximum(dt_yr, 1e-12))
    # sites with negligible rain pass it straight through (calss
    # raincal_cutoff branch, sediment.F:1130-1146)
    ttrcal = jnp.where(rain_cal_y > RAINCAL_CUTOFF, ttrcal,
                       rain_cal_y)

    # mixed-layer calcite mass update (bury, bulk form): mass change =
    # rain - dissolution; burial keeps calgg <= 0.95
    sed_mass = jnp.sum(delz * (1.0 - pore) * 2.5, axis=0)  # g/cm^2
    cal_mass = jnp.sum(state.calgg * delz * (1.0 - pore) * 2.5,
                       axis=0)                             # g/cm^2
    dcal = (rain_cal_y - ttrcal) * 100.0 * dt_yr           # g/cm^2
    cal_new = jnp.clip(cal_mass + dcal, 0.0, 0.95 * sed_mass)
    burial = jnp.maximum(cal_mass + dcal - 0.95 * sed_mass, 0.0) \
        / 100.0 / jnp.maximum(dtsed_s, 1.0)                # mol/cm^2/s
    frac_new = cal_new / jnp.maximum(sed_mass, 1e-12)
    calgg_new = jnp.broadcast_to(frac_new[None], state.calgg.shape)
    calgg_new = calgg_new * (ocean_mask > 0)[None]

    per_s = 1.0 / SEC_PER_YR
    fluxes = dict(
        dic=(ttrcal + ttrorg) * per_s * 1.0e6 * ocean_mask,
        alk=2.0 * ttrcal * per_s * 1.0e6 * ocean_mask,
        o2=-ttrorg * 1.3 * per_s * 1.0e6 * ocean_mask,
        burial=burial * 1.0e6 * ocean_mask,
        ttrcal=ttrcal, ttrorg=ttrorg, zrct=zrct, co3_bw=co3_bw,
        csat=csat)

    new = PoreWaterState(
        calgg=jnp.where((ocean_mask > 0)[None], calgg_new,
                        state.calgg),
        orggg=jnp.where((ocean_mask > 0)[None], orggg, state.orggg),
        carb=jnp.where((ocean_mask > 0)[None, None], carb, state.carb),
        o2=jnp.where((ocean_mask > 0)[None], o2, state.o2),
        zrct=jnp.where(ocean_mask > 0, zrct, state.zrct),
        buried=state.buried + burial * dtsed_s * ocean_mask,
        buried_org=state.buried_org)
    return new, fluxes
