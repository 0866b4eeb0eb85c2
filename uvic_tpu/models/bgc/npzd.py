"""NPZD marine ecosystem model.

TPU-native re-design of source/mom/npzd_src.F (Schmittner et al. 2005 /
Oschlies & Garcon 1999) and its caller (tracer.F:256-521):

- the per-(i,k) column loop with substepped ODE sources becomes a
  `lax.scan` down the vertical carrying the shortwave attenuation and
  detrital export chain, with every (j,i) column in the batch,
- the `nbio` ODE substeps run in an inner `fori_loop` (all cells),
- calcite production collects over the column and redistributes with
  the rcak/rcab profiles; O2 consumption and denitrification follow
  the OCMIP limiters (tracer.F:458-480).

Parameter defaults and unit conversions reproduce UVic_ESCM.F:1430-1455
and setmom.F:937-977 (per-day rates -> per-second, m -> cm).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import DAYLEN, PI

TRCMIN = 5.0e-12   # npzd.h:68


@dataclass
class NpzdParams:
    """Namelist parameters in input units (per day, per m)."""
    kw: float = 0.04        # light attenuation of water [1/m]
    kc: float = 0.047       # light attenuation by phytoplankton
    ki: float = 5.0         # attenuation through ice/snow [1/m]
    abio: float = 0.18      # max growth rate a [1/day]
    bbio: float = 1.066
    cbio: float = 1.0
    k1n: float = 0.7        # N half saturation [mmol/m^3]
    nup: float = 0.025      # quadratic P mortality [1/day]
    nupt0: float = 0.02     # specific P mortality [1/day]
    gamma1: float = 0.925   # assimilation efficiency
    gbio: float = 1.575     # max grazing [1/day]
    epsbio: float = 1.6     # prey capture rate
    nuz: float = 0.34       # quadratic Z mortality
    gamma2: float = 0.01    # excretion [1/day]
    nud0: float = 0.048     # remineralization [1/day]
    wd0: float = 6.0        # detritus sinking at surface [m/day]
    alpha: float = 0.1      # P-I curve initial slope
    par: float = 0.43       # photosynthetically active fraction
    dtnpzd: float = 27000.0  # biology substep [s]
    redctn: float = 7.0     # C/N Redfield (input units; x1e-3 internally)
    redptn: float = 1.0 / 16.0
    redotn: float = 10.6
    capr: float = 0.018     # calcite production ratio
    dcaco3: float = 650000.0  # calcite remineralization depth [cm]
    jdiar: float = 0.5      # diazotroph growth reduction
    nitrogen: bool = False
    o2: bool = False
    carbon: bool = False
    alk: bool = False


class Npzd:
    """Precomputed per-level arrays + jitted source computation."""

    def __init__(self, params: NpzdParams, grid, idx, c2dtts: float,
                 dtype=np.float64):
        p = params
        self.p = p
        self.idx = idx
        km = grid.km
        # unit conversions (setmom.F:937-957)
        self.redctn = p.redctn * 1.0e-3
        self.redotn = p.redotn * 1.0e-3
        self.redptn = p.redptn
        self.redotp = self.redotn / p.redptn
        self.redctp = self.redctn / p.redptn
        self.redntp = 1.0 / p.redptn
        self.k1n = p.k1n
        self.k1p = p.k1n * p.redptn
        self.kw = p.kw * 1.0e-2
        self.kc = p.kc * 1.0e-2
        self.ki = p.ki * 1.0e-2
        wd0 = p.wd0 * 1.0e2
        self.abio = p.abio / DAYLEN
        self.nup = p.nup / DAYLEN
        self.nupt0 = p.nupt0 / DAYLEN
        self.gbio = p.gbio / DAYLEN
        self.epsbio = p.epsbio / DAYLEN
        self.nuz = p.nuz / DAYLEN
        self.gamma2 = p.gamma2 / DAYLEN
        self.nud0 = p.nud0 / DAYLEN
        self.alpha = p.alpha / DAYLEN
        self.tap = 2.0 * self.alpha * p.par

        zt = np.asarray(grid.zt)
        zw = np.asarray(grid.zw)
        dzt = np.asarray(grid.dzt)
        self.wd = jnp.asarray((wd0 + 4.0e-2 * zt) / DAYLEN / dzt, dtype)
        self.ztt = jnp.asarray(-zt + dzt / 2.0, dtype)
        self.rkwz = jnp.asarray(1.0 / (self.kw * dzt), dtype)
        self.dzt = jnp.asarray(dzt, dtype)
        self.dztr = jnp.asarray(1.0 / dzt, dtype)
        # calcite remineralization profiles (setmom.F:970-977)
        rcak = np.empty(km)
        rcab = np.empty(km)
        rcak[0] = -(np.exp(-zw[0] / p.dcaco3) - 1.0) / dzt[0]
        rcab[0] = -1.0 / dzt[0]
        rcak[1:] = (-np.exp(-zw[1:] / p.dcaco3)
                    + np.exp(-zw[:-1] / p.dcaco3)) / dzt[1:]
        rcab[1:] = np.exp(-zw[:-1] / p.dcaco3) / dzt[1:]
        self.rcak = jnp.asarray(rcak, dtype)
        self.rcab = jnp.asarray(rcab, dtype)

        # biology substep counts (tracer.F:264-269); dtxcel = 1
        self.nbio = max(1, int(round(c2dtts / p.dtnpzd)))
        self.dtbio = c2dtts / self.nbio
        self.rdtts = 1.0 / c2dtts
        self.rnbio = 1.0 / self.nbio
        self.c2dtts = c2dtts

    # ------------------------------------------------------------------
    def _ode_substeps(self, tnpzd, gl, bct, impo, dzt_k, dayfrac, wwd,
                      rkw, nud, dtbio=None):
        """nbio Euler substeps of the NPZD ODEs (npzd_src.F)."""
        p = self
        dtbio = p.dtbio if dtbio is None else dtbio
        f1 = jnp.exp((-p.kw - p.kc * tnpzd[1]) * dzt_k)
        jmax = p.abio * bct
        gd = jnp.maximum(1.0e-14, jmax * dayfrac)
        u1 = jnp.maximum(gl / gd, 1.0e-6)
        u2 = u1 * f1

        def phi(u):
            s = jnp.sqrt(1.0 + u * u)
            return jnp.log(u + s) - (s - 1.0) / u

        avej = gd * rkw * (phi(u1) - phi(u2))
        if p.p.nitrogen:
            jmax_d = jnp.maximum(0.0, p.abio * (bct - 2.6)) * p.p.jdiar
            gd_d = jnp.maximum(1.0e-14, jmax_d * dayfrac)
            u1d = jnp.maximum(gl / gd_d, 1.0e-6)
            u2d = u1d * f1
            avej_d = gd_d * rkw * (phi(u1d) - phi(u2d))
        nupt = p.nupt0 * bct

        def step(n, carry):
            bion, biop, bioz, biod, biono3, biodiaz, expo_acc, aux = carry
            u_p = jnp.minimum(avej, jmax * bion / (p.k1p + bion))
            if p.p.nitrogen:
                u_p = jnp.minimum(u_p, jmax * biono3 / (p.k1n + biono3))
                u_d = jnp.minimum(avej_d,
                                  jmax_d * bion / (p.k1p + bion))
                npp_d = jnp.maximum(0.0, u_d * biodiaz)
                g_d = (p.gbio * p.epsbio * biodiaz ** 2
                       / (p.gbio + p.epsbio * biodiaz ** 2))
                graz_d = g_d * bioz
                morp_d = nupt * biodiaz
                no3upt_d = biono3 / (p.k1n + biono3) * npp_d
            npp = u_p * biop
            biop2 = biop * biop
            g_p = p.gbio * p.epsbio * biop2 / (p.gbio + p.epsbio * biop2)
            graz = g_p * bioz
            morp = p.nup * biop2
            morpt = nupt * biop
            morz = p.nuz * bioz * bioz
            remi = nud * bct * biod
            excr = p.gamma2 * bct * bioz
            expo = wwd * biod

            def flag(x):
                return 0.5 + jnp.sign(x - TRCMIN) * 0.5

            nf, pf, zf, df = flag(bion), flag(biop), flag(bioz), flag(biod)
            graz, morp, morpt = graz * pf, morp * pf, morpt * pf
            morz, excr = morz * zf, excr * zf
            remi, expo = remi * df, expo * df
            if p.p.nitrogen:
                no3f, dzf = flag(biono3), flag(biodiaz)
                npp = npp * nf * no3f
                npp_d = npp_d * nf
                graz_d = graz_d * dzf
                morp_d = morp_d * dzf
                no3upt_d = no3upt_d * no3f
                tot_npp = npp + npp_d
                tot_graz = graz + graz_d
            else:
                npp = npp * nf
                npp_d = graz_d = morp_d = no3upt_d = 0.0
                tot_npp = npp
                tot_graz = graz

            ts = dtbio
            bion = bion + ts * p.redptn * (remi + excr - tot_npp + morpt)
            biop = biop + ts * (npp - morp - graz - morpt)
            bioz = bioz + ts * (p.p.gamma1 * tot_graz - excr - morz)
            biod = biod + ts * ((1.0 - p.p.gamma1) * tot_graz + morp
                                + morp_d + morz - remi - expo + impo)
            if p.p.nitrogen:
                biono3 = biono3 + ts * (remi + excr - npp + morpt
                                        - no3upt_d)
                biodiaz = biodiaz + ts * (npp_d - morp_d - graz_d)
            aux = dict(
                graz=aux["graz"] + graz, morp=aux["morp"] + morp,
                morz=aux["morz"] + morz)
            return (bion, biop, bioz, biod, biono3, biodiaz,
                    expo_acc + expo, aux)

        zero = jnp.zeros_like(tnpzd[0])
        aux0 = dict(graz=zero, morp=zero, morz=zero)
        init = (tnpzd[0], tnpzd[1], tnpzd[2], tnpzd[3],
                tnpzd[4] if p.p.nitrogen else zero,
                tnpzd[5] if p.p.nitrogen else zero, zero, aux0)
        out = jax.lax.fori_loop(0, p.nbio, step, init)
        bion, biop, bioz, biod, biono3, biodiaz, expo_acc, aux = out
        delta = [bion - tnpzd[0], biop - tnpzd[1], bioz - tnpzd[2],
                 biod - tnpzd[3]]
        if p.p.nitrogen:
            delta += [biono3 - tnpzd[4], biodiaz - tnpzd[5]]
        return delta, expo_acc, aux

    # ------------------------------------------------------------------
    def sources(self, t_tm1, kmt, tmask, swr_in, aice, hice, hsno,
                tlat_rad, relyr, c2dtts=None):
        """Source terms for all bgc tracers (tracer.F:256-521).

        t_tm1 : (nt, km, jmt, imt) tracers at tau-1
        swr_in: (jmt, imt) downward surface shortwave [erg/cm^2/s]
        returns src: (nt, km, jmt, imt) with zeros for T,S.
        """
        p = self
        idx = self.idx
        km = t_tm1.shape[1]
        if c2dtts is None:
            dtbio, rdtts = p.dtbio, p.rdtts
        else:
            dtbio, rdtts = c2dtts / p.nbio, 1.0 / c2dtts
        declin = jnp.sin((jnp.mod(relyr, 1.0) - 0.22) * 2.0 * PI) * 0.4

        rctheta = jnp.clip(tlat_rad - declin, -1.5, 1.5)
        rctheta = p.kw / jnp.sqrt(
            1.0 - (1.0 - jnp.cos(rctheta) ** 2) / 1.33 ** 2)
        dayfrac = jnp.minimum(1.0, -jnp.tan(tlat_rad) * jnp.tan(declin))
        dayfrac = jnp.maximum(
            1e-12, jnp.arccos(jnp.maximum(-1.0, dayfrac)) / PI)

        swr0 = swr_in * 1e-3 * (
            1.0 + aice * (jnp.exp(-p.ki * (hice + hsno)) - 1.0))

        temp = t_tm1[idx.itemp]
        bct_all = p.p.bbio ** (p.p.cbio * temp)
        if p.p.o2:
            o2 = t_tm1[idx.io2]
            nud_all = p.nud0 * (0.65 + 0.35 * jnp.tanh(o2 * 1000.0 - 6.0))
        else:
            nud_all = jnp.broadcast_to(
                jnp.asarray(p.nud0, temp.dtype), temp.shape)

        names = ["po4", "phyt", "zoop", "detr"]
        if p.p.nitrogen:
            names += ["no3", "diaz"]
        tr_idx = [getattr(idx, "i" + n) for n in names]

        levels = jnp.arange(km)[:, None, None]
        in_col = (levels < kmt[None]).astype(temp.dtype)

        def level_step(carry, kin):
            swr, expo, phin = carry
            k, tnpzd_k, bct, nud, mask_k = kin
            swr = swr * jnp.exp(-p.kc * phin)
            phin = phin + tnpzd_k[1] * self.dzt[k]
            gl = p.tap * swr * jnp.exp(self.ztt[k] * rctheta)
            impo = expo * self.dztr[k]
            delta, expo_col, aux = self._ode_substeps(
                tnpzd_k, gl, bct, impo, self.dzt[k], dayfrac,
                self.wd[k], self.rkwz[k], nud, dtbio)
            expo_rate = expo_col * p.rnbio
            # bottom remineralization handled after the scan
            snpzd = [d * rdtts * mask_k for d in delta]
            dprca = ((aux["morp"] + aux["morz"]
                      + aux["graz"] * (1.0 - p.p.gamma1))
                     * p.p.capr * p.redctn * p.rnbio) * mask_k
            expo_out = expo_rate * self.dzt[k] * mask_k
            out = (jnp.stack(snpzd), expo_rate * mask_k, dprca)
            return (swr, expo_out, phin), out

        tnpzd_all = jnp.maximum(
            jnp.stack([t_tm1[i] for i in tr_idx]), TRCMIN)
        ks = jnp.arange(km)
        kin = (ks, jnp.moveaxis(tnpzd_all, 1, 0), bct_all, nud_all, in_col)
        zero2 = jnp.zeros_like(swr0)
        (_, _, _), (snpzd_k, expo_k, dprca_k) = jax.lax.scan(
            level_step, (swr0, zero2, zero2), kin)
        # snpzd_k: (km, nbio_tracers, jmt, imt) -> (tracer, km, j, i)
        snpzd = jnp.moveaxis(snpzd_k, 0, 1)

        # bottom detrital export remineralizes in the bottom cell
        is_bot = (levels == (kmt - 1)[None]).astype(temp.dtype)
        expo_bot = jnp.take_along_axis(
            expo_k, jnp.maximum(kmt - 1, 0)[None], axis=0)[0]
        snpzd = snpzd.at[0].add(is_bot * p.redptn * expo_bot[None])
        if p.p.nitrogen:
            snpzd = snpzd.at[4].add(is_bot * expo_bot[None])

        src = jnp.zeros_like(t_tm1)
        for n, i in enumerate(tr_idx):
            src = src.at[i].set(snpzd[n])

        # calcite production/remineralization (tracer.F:410-520)
        if p.p.carbon or p.p.alk:
            prca = jnp.sum(dprca_k * self.dzt[:, None, None] * in_col,
                           axis=0)
            not_bot = in_col * (1.0 - is_bot)
            remin = (prca[None] * self.rcak[:, None, None] * not_bot
                     + prca[None] * self.rcab[:, None, None] * is_bot)
            dprca = jnp.moveaxis(dprca_k, 0, 0)  # (km, j, i)
            if p.p.carbon:
                src = src.at[idx.idic].set(
                    (snpzd[0] * p.redctp - dprca) * in_col + remin)
            if p.p.alk:
                src = src.at[idx.ialk].set(
                    (-snpzd[0] * p.redntp * 1e-3 - 2.0 * dprca) * in_col
                    + 2.0 * remin)

        # oxygen consumption + denitrification (tracer.F:458-480)
        if p.p.o2:
            fo2 = 0.5 * jnp.tanh(t_tm1[idx.io2] * 1000.0 - 5.0)
            so2 = snpzd[0] * p.redotp
            src = src.at[idx.io2].set(-so2 * (0.5 + fo2) * in_col)
            if p.p.nitrogen:
                no3flag = 0.5 + 0.5 * jnp.sign(
                    t_tm1[idx.ino3] - TRCMIN)
                deni = 800.0 * no3flag * so2 * (0.5 - fo2)
                src = src.at[idx.ino3].add(-deni * in_col)

        return src
