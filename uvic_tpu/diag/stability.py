"""Numerical stability monitors (stab.F parity, O_stability_tests).

Per-cell CFL fractions for u, v and the vertical advective velocities
(stab.F:74-178: percent of the local CFL limit, with the limit fields
umax = dx/(2 dtmax), vmax = dy/(2 dtmax), wmax = dzw/(2 dtmax) and
dtmax = max(dtuv, dtts*dtxcel)), grid Reynolds numbers (|u| dx / visc,
stab.F:216-248) and grid Peclet numbers (|u| dx / diff, stab.F:249-281)
— each with the argmax OFFENDER LOCATION (k, j, i) -> (depth, lat, lon)
so a destabilization is triaged from one log line, the job stab.F does
with its icflu/jcflu/kcflu bookkeeping.

The whole scan is one jitted reduction; `check` returns host scalars,
`report` formats the one-line yearly log entry used by coupler.run.Run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EPSLN


class StabilityMonitor:
    def __init__(self, ocean_model, cflcrt: float = 100.0):
        self.m = ocean_model
        m = ocean_model
        g = m.params.grid
        cfg = m.cfg.ocean
        km, jmt, imt = g.km, g.jmt, g.imt
        self.shape = (km, jmt, imt)
        self.cflcrt = cflcrt

        # local CFL limits (stab.F:90-96): dtmax = max(dtuv, dtts*dtxcel)
        dtmax = np.maximum(cfg.dtuv,
                           cfg.dtts * np.asarray(m.params.dtxcel))
        self.umax = jnp.asarray(
            0.5 * np.asarray(g.csu)[None, :, None]
            * np.asarray(g.dxu)[None, None, :] / dtmax[:, None, None])
        self.vmax = jnp.asarray(
            0.5 * np.asarray(g.dyu)[None, :, None]
            / dtmax[:, None, None]) * jnp.ones((1, 1, imt))
        self.wmax = jnp.asarray(
            0.5 * np.asarray(g.dzw)[:km] / dtmax)[:, None, None] \
            * jnp.ones((1, jmt, imt))

        # effective mixing coefficients for Reynolds/Peclet denominators.
        # APPROXIMATION (ADVICE r4): these are the static background
        # fields — runtime additions (isopycnal K33, tidal-dissipation
        # profile, PP shear mixing) are not included, and ahisop enters
        # as plain horizontal diffusivity; Pe/Re triage figures are
        # therefore conservative where mixing is state-dependent.
        # Diagnostic-only: none of this feeds back on the model.
        if m.aniso_visc is not None:
            self.visc_e, self.visc_n = m.aniso_visc
        else:
            self.visc_e = jnp.full((1, 1, 1), cfg.am)
            self.visc_n = jnp.full((1, 1, 1), cfg.am)
        ah_eff = cfg.ah + (cfg.ahisop if cfg.isopycmix else 0.0)
        self.ah_eff = float(ah_eff)
        self.dxu3 = jnp.asarray(np.asarray(g.dxu))[None, None, :]
        self.dyu3 = jnp.asarray(np.asarray(g.dyu))[None, :, None]
        self.dzw3 = jnp.asarray(np.asarray(g.dzw)[:km])[:, None, None]
        self.yt = np.asarray(g.yt)
        self.xt = np.asarray(g.xt)
        self.zt_km = np.asarray(g.zt) / 1.0e5
        self._check = jax.jit(self._check_impl)

    def _check_impl(self, u_full, vbt, vbu):
        m = self.m
        # CFL percent-of-limit fields (stab.F:139-178)
        pcflu = 100.0 * jnp.abs(u_full[0]) / self.umax * m.umask
        pcflv = 100.0 * jnp.abs(u_full[1]) / self.vmax * m.umask
        pcflwu = 100.0 * jnp.abs(vbu) / self.wmax * m.umask
        pcflwt = 100.0 * jnp.abs(vbt) / self.wmax * m.tmask

        # grid Reynolds / Peclet (stab.F:216-281)
        reyx = jnp.abs(u_full[0] * self.dxu3) / (self.visc_e + EPSLN) \
            * m.umask
        reyy = jnp.abs(u_full[1] * self.dyu3) / (self.visc_n + EPSLN) \
            * m.umask
        reyz = jnp.abs(vbu * self.dzw3) / (m.visc_cbu + EPSLN) * m.umask
        pecx = jnp.abs(u_full[0] * self.dxu3) / self.ah_eff * m.umask
        pecy = jnp.abs(u_full[1] * self.dyu3) / self.ah_eff * m.umask
        pecz = jnp.abs(vbt * self.dzw3) / (m.diff_cbt + EPSLN) * m.tmask

        out = {}
        for name, f in (("cflu", pcflu), ("cflv", pcflv),
                        ("cflwu", pcflwu), ("cflwt", pcflwt),
                        ("reyx", reyx), ("reyy", reyy), ("reyz", reyz),
                        ("pecx", pecx), ("pecy", pecy), ("pecz", pecz)):
            out[name] = jnp.max(f)
            out[name + "_arg"] = jnp.argmax(f)
        out["n_cfl_violations"] = jnp.sum(
            (pcflu >= self.cflcrt) | (pcflv >= self.cflcrt)
            | (pcflwu >= self.cflcrt) | (pcflwt >= self.cflcrt))
        return out

    # ------------------------------------------------------------------
    def check(self, ocean_state) -> dict:
        """Scan the state; returns {metric: value, metric_at: (depth_km,
        lat, lon)} host scalars."""
        from ..models.ocean.kernels import adv_vel
        m = self.m
        u = m.full_velocity(ocean_state.u, ocean_state.psi0)
        _, _, vbt, _, _, vbu = adv_vel(u[0], u[1], m.g, m.cyclic)
        raw = self._check(u, vbt, vbu)
        out = {}
        for k, v in raw.items():
            if k.endswith("_arg"):
                kk, jj, ii = np.unravel_index(int(v), self.shape)
                out[k[:-4] + "_at"] = (round(float(self.zt_km[kk]), 2),
                                       round(float(self.yt[jj]), 1),
                                       round(float(self.xt[ii]), 1))
            else:
                out[k] = float(v)
        return out

    def report(self, ocean_state) -> str:
        """One-line yearly triage entry (stab.F print analog)."""
        d = self.check(ocean_state)
        return ("stab: cfl% u={cflu:.0f}@{cflu_at} v={cflv:.0f}@{cflv_at}"
                " w={cflwt:.0f}@{cflwt_at} | Re x={reyx:.0f} y={reyy:.0f}"
                " z={reyz:.1f}@{reyz_at} | Pe x={pecx:.0f}@{pecx_at}"
                " z={pecz:.1f} | viol={n:.0f}").format(
                    n=d["n_cfl_violations"], **d)
