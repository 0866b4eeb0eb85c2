"""Vertical mixing coefficient schemes.

TPU-native re-design of source/mom/vmixc.F and ppmix.F:

- constant coefficients (O_constvmix),
- Bryan & Lewis (1979) depth-dependent profile (O_bryan_lewis_vertical),
- Pacanowski & Philander (1981) Richardson-number mixing (O_ppvmix),
- tidal mixing hook (O_tidal_kv): kappa from a dissipation field; with
  no dissipation data (the reference reads a file absent upstream) it
  reduces to the background.

All schemes return diff_cbt/visc_cbu at cell bottoms (km, jmt, imt).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...constants import GRAV
from ...ops.eos import dens
from ...ops.stencil import DN, E, N, S, W, setbcx


def bryan_lewis_profile(zw_cm, afkph=0.8, dfkph=1.05, sfkph=4.5e-5,
                        zfkph=2500.0e2):
    """Bryan-Lewis vertical diffusivity Ahv(k) [cm^2/s]: an arctangent
    profile increasing from ~0.3 at the surface to ~1.3 at depth."""
    return afkph + (dfkph / np.pi) * np.arctan(sfkph * (zw_cm - zfkph))


def ppmix_coefficients(t_tracers, u_full, tmask, umask, eos_c, eos_to,
                       eos_so, g, fricmx=50.0, wndmix=10.0,
                       visc_cbu_back=1.0, diff_cbt_back=0.1,
                       visc_cbu_limit=None, diff_cbt_limit=1.0e6,
                       cyclic=True):
    """Pacanowski-Philander Richardson mixing (ppmix.F:202-420).

    Returns (diff_cbt, visc_cbu) at cell bottoms.
    """
    if visc_cbu_limit is None:
        visc_cbu_limit = fricmx
    km = t_tracers.shape[1]
    T, Ssal = t_tracers[0], t_tracers[1]
    # density difference across cell bottoms, lower-level reference
    # coefficients (statec semantics)
    c_dn = eos_c[1:][:, None, None, :]
    to_dn = eos_to[1:][:, None, None]
    so_dn = eos_so[1:][:, None, None]
    rho_up = dens(c_dn, T[:-1] - to_dn, Ssal[:-1] - so_dn)
    rho_dn = dens(c_dn, T[1:] - to_dn, Ssal[1:] - so_dn)
    rhom1z = (rho_up - rho_dn) * tmask[1:]            # (km-1, j, i)

    du = u_full[0][:-1] - u_full[0][1:]
    dv = u_full[1][:-1] - u_full[1][1:]
    uzsq = du ** 2 + dv ** 2                           # at U cells

    # Richardson number at bottom of T cells: average the 4 surrounding
    # U-cell shears (ppmix.F:336-346)
    shear = uzsq + W(uzsq) + S(uzsq) + S(W(uzsq)) + 1.0e-25
    dzw_k = g.dzw[1:km].reshape(km - 1, 1, 1)
    rit = (-4.0 * GRAV) * dzw_k * rhom1z / shear
    t2 = 1.0 / (1.0 + 5.0 * rit)
    diff_cbt = (fricmx * t2 ** 3 + diff_cbt_back) * tmask[1:]
    visc_cbt = (fricmx * t2 ** 2 + visc_cbu_back) * tmask[1:]

    # gravitational instability -> large coefficients (ppmix.F:354-362)
    unstable = rhom1z > 0.0
    diff_cbt = jnp.where(unstable, diff_cbt_limit, diff_cbt)
    visc_cbt = jnp.where(unstable, visc_cbu_limit, visc_cbt)
    visc_cbt = setbcx(visc_cbt, cyclic)

    # viscosity at U-cell bottoms: 4-point average (ppmix.F:370-378)
    visc_cbu = 0.25 * (visc_cbt + E(visc_cbt) + N(visc_cbt)
                       + N(E(visc_cbt))) * umask[1:]

    # wind-mixing floor at the first interface; zero bottom flux
    diff_cbt = diff_cbt.at[0].set(
        jnp.maximum(diff_cbt[0], wndmix * tmask[1]))
    visc_cbu = visc_cbu.at[0].set(
        jnp.maximum(visc_cbu[0], wndmix * umask[1]))

    pad = jnp.zeros_like(diff_cbt[:1])
    diff_cbt = jnp.concatenate([diff_cbt, pad], axis=0)
    visc_cbu = jnp.concatenate([visc_cbu, pad], axis=0)
    return setbcx(diff_cbt, cyclic), setbcx(visc_cbu, cyclic)


def tidal_kv_addition(drodzb, kmt, zw, edr, gamma=0.2, zeta_cm=500.0e2,
                      kappa_max=10.0):
    """Tidal-dissipation diffusivity addition (vmixc.F:77-103,
    O_tidal_kv): kappa = gamma*Gamma*eps/(rho N^2) with an exponential
    decay above the bottom. ``edr`` is the energy-dissipation field the
    reference reads from a data file; pass zeros to disable."""
    km = drodzb.shape[0]
    zn2 = -(GRAV / 1.035) * drodzb
    levels = jnp.arange(km).reshape(km, 1, 1)
    zw_k = zw[:km].reshape(km, 1, 1)
    depth = jnp.take(zw, jnp.maximum(kmt - 1, 0))[None]
    hab = zw_k - depth + jnp.take(zw, jnp.maximum(kmt - 1, 0))[None] * 0
    hab = depth - zw_k                      # height above bottom
    zetar = 1.0 / zeta_cm
    denom = zn2 * (1.0 - jnp.exp(-zetar * depth)) + 1.0e-30
    zkappa = 0.33 * gamma * edr[None] * jnp.exp(-hab * zetar) / denom
    zkappa = jnp.where(zn2 > 0, zkappa, 0.0)
    return jnp.clip(zkappa, 0.0, kappa_max)
