"""Ocean circulation diagnostics: energetics, meridional overturning,
and northward tracer-transport (gyre) components.

TPU-native re-design of the reference diagnostics
(source/mom/energy.F, gyre.F, diagi.F/diago.F overturning output):
instead of accumulating scalars inside the j-row memory-window loop,
each diagnostic is a pure jittable function over the full 3-D fields —
zonal/vertical reductions map onto single XLA reduce ops.

All quantities are CGS (transports in cm^3/s = 1e-12 Sv; energies in
erg).  Heat transport in cal/s follows the reference's heat-flux unit
convention (multiply by rho0*cp externally for W).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.ocean.kernels import adv_vel
from ..models.ocean.tropic import ext_mode_velocity

SV_CGS = 1.0e12  # 1 Sverdrup in cm^3/s


# ----------------------------------------------------------------------
# meridional overturning streamfunction
# ----------------------------------------------------------------------

def meridional_overturning(v, g, umask):
    """Meridional overturning streamfunction psi_moc(k, j) in cm^3/s.

    psi(k, j) = -int_{-H}^{z_k} int_x v dx dz through the U-point
    latitude row (reference diagi.F "meridional overturning of mass").
    With the B-grid rigid lid the column-integrated transport through a
    full latitude circle vanishes (internal mode is depth-mean-free and
    the external mode is the curl of a cyclic psi), so psi_moc returns
    to ~0 at the bottom.

    v     : (km, jmt, imt) full northward velocity at tau (internal +
            external mode)
    g     : ocean param bag (OceanModel.g)
    umask : (km, jmt, imt)

    Divide by 1e12 for Sv.
    """
    # exclude the duplicated cyclic boundary columns (0 and imt-1)
    xmask = jnp.ones_like(v[0]).at[:, 0].set(0.0).at[:, -1].set(0.0)
    trans = jnp.sum(v * umask * xmask
                    * (g.dxu * g.csu[:, None])[None], axis=2) \
        * g.dzt[:, None]                                  # (km, jmt)
    return -jnp.cumsum(trans, axis=0)


def gm_overturning(vntiso, g, xmask2d=None):
    """Overturning streamfunction of the GM eddy-induced (bolus)
    velocity, psi_gm(k, j) in cm^3/s (diago.F O_gm_diag: the
    reference's overturning adds adv_vntiso to the Eulerian v).

    vntiso : (km, jmt, imt) bolus meridional velocity at T-cell north
             faces as produced by isopyc._gm_velocities — the csu
             metric factor is already folded in, so the zonal integral
             uses dxt only.
    xmask2d: optional (jmt, imt) column mask (e.g. an Atlantic basin
             mask) applied on top of the cyclic-duplicate exclusion.

    psi_residual = meridional_overturning(v) + gm_overturning(vntiso).
    """
    xmask = jnp.ones_like(vntiso[0]).at[:, 0].set(0.0).at[:, -1].set(0.0)
    if xmask2d is not None:
        xmask = xmask * xmask2d
    trans = jnp.sum(vntiso * xmask * g.dxt[None, None, :], axis=2) \
        * g.dzt[:, None]                                   # (km, jmt)
    return -jnp.cumsum(trans, axis=0)


def overturning_extrema(psi_moc, g):
    """Scalar summary: max/min overturning (Sv) and the NADW-style max
    below 500 m (the tsi-style headline number)."""
    deep = g.zt >= 500.0e2
    return {
        "moc_max_sv": jnp.max(psi_moc) / SV_CGS,
        "moc_min_sv": jnp.min(psi_moc) / SV_CGS,
        "moc_deep_max_sv": jnp.max(
            jnp.where(deep[:, None], psi_moc, -jnp.inf)) / SV_CGS,
    }


# ----------------------------------------------------------------------
# northward tracer transport components (gyre.F)
# ----------------------------------------------------------------------

def gyre_components(v, t_n, g, tmask, smf=None, cori=None):
    """Northward transport of tracer n split into components
    (gyre.F:1-140 ttn(1..8)).  Everything is a function of latitude row.

    v    : (km, jmt, imt) northward velocity at tau
    t_n  : (km, jmt, imt) one tracer at tau
    smf  : optional (2, jmt, imt) surface momentum flux for the Ekman
           component ttn(5)
    cori : optional (jmt, imt) Coriolis parameter at U points

    Returns dict of (jmt,) arrays:
      total_adv      ttn(6): int adv_vnt * Tbar_face dx dz
      overturning    ttn(1): sum_k [int v dx] * [zonal-mean T] dz
      gyre           ttn(2) = total_adv - overturning
      depth_mean     ttn(3): sum_x [int v dz] * [depth-mean T]
      ekman          ttn(5) (0 if smf/cori not given)
      residual       ttn(4) = total_adv - depth_mean - ekman
    """
    small = 1e-10
    u0 = jnp.zeros_like(v)
    _, vnt, *_ = adv_vel(u0, v, g, cyclic=True)
    dxt = g.dxt[None, None, :]
    dzt = g.dzt[:, None]
    mask_pair = tmask * jnp.roll(tmask, -1, axis=1)
    t_north = jnp.roll(t_n, -1, axis=1)

    # ttn(6): total advective transport through the north face
    tot = jnp.sum(0.5 * vnt * (t_n + t_north) * mask_pair * dxt,
                  axis=2) * dzt                          # (km, jmt)
    total_adv = jnp.sum(tot, axis=0)

    # ttn(1): overturning = zonal-int(v) x zonal-mean(T) per level
    dxu = g.dxu[None, None, :]
    vbr = jnp.sum(v * dxu * g.csu[None, :, None], axis=2)       # (km,jmt)
    totdxs = jnp.sum(dxt * tmask, axis=2) + small
    totdxn = jnp.sum(dxt * jnp.roll(tmask, -1, axis=1), axis=2) + small
    tbrs = jnp.sum(t_n * tmask * dxt, axis=2) / totdxs
    tbrn = jnp.sum(t_north * jnp.roll(tmask, -1, axis=1) * dxt,
                   axis=2) / totdxn
    overturning = jnp.sum(vbr * 0.5 * (tbrn + tbrs) * dzt, axis=0)

    # ttn(3): depth-mean component per column, then zonal sum
    totz = jnp.sum(mask_pair * g.dzt[:, None, None], axis=0)     # (jmt,imt)
    vbrz = jnp.sum(vnt * dxt * g.dzt[:, None, None], axis=0)
    tbrz = jnp.where(totz > 0,
                     jnp.sum(mask_pair * (t_n + t_north)
                             * g.dzt[:, None, None], axis=0)
                     / jnp.maximum(totz, small), 0.0)
    depth_mean = jnp.sum(jnp.where(totz > 0, vbrz * tbrz * 0.5, 0.0),
                         axis=1)

    # ttn(5): Ekman component from the zonal wind stress
    if smf is not None and cori is not None:
        cori_eff = jnp.where(jnp.abs(cori) > 0, cori,
                             jnp.roll(cori, 1, axis=0))
        factor = 4.0 * cori_eff
        taux_pair = (smf[0] * g.dxu[None, :]
                     + jnp.roll(smf[0] * g.dxu[None, :], 1, axis=1))
        surf = (t_n[0] + t_north[0] - tbrz)
        ek = jnp.where((totz > 0) & (jnp.abs(factor) > 1e-12),
                       -taux_pair * surf * g.csu[:, None]
                       / jnp.where(jnp.abs(factor) > 1e-12, factor, 1.0),
                       0.0)
        ekman = jnp.sum(ek, axis=1)
    else:
        ekman = jnp.zeros_like(total_adv)

    return {
        "total_adv": total_adv,
        "overturning": overturning,
        "gyre": total_adv - overturning,
        "depth_mean": depth_mean,
        "ekman": ekman,
        "residual": total_adv - depth_mean - ekman,
    }


# ----------------------------------------------------------------------
# energetics (energy.F)
# ----------------------------------------------------------------------

def energy_integrals(state, model, forcing=None):
    """Global energetics of the B-grid solution (energy.F ge1/ge2):
    kinetic energy split into external/internal modes, wind work on the
    surface, and the external-mode transport extrema.

    Returns dict of scalars (CGS: erg, erg/s, Sv).
    """
    umask = model.umask
    grid = model.params.grid

    uext, vext = ext_mode_velocity(
        state.psi0, model.g.hr, model.g.dxu2r, model.g.dyu2r, model.g.csur)
    u_full = state.u[0] + uext[None]
    v_full = state.u[1] + vext[None]

    boxvol = (grid.csu[None, :, None] * grid.dyu[None, :, None]
              * grid.dxu[None, None, :] * grid.dzt[:, None, None]) * umask
    vol = jnp.sum(boxvol)

    ke_tot = 0.5 * jnp.sum((u_full**2 + v_full**2) * boxvol)
    ke_ext = 0.5 * jnp.sum(
        (uext**2 + vext**2) * jnp.sum(boxvol, axis=0))
    ke_int = 0.5 * jnp.sum((state.u[0]**2 + state.u[1]**2) * boxvol)

    out = {
        "ke_total_per_vol": ke_tot / vol,     # cm^2/s^2 (erg/g)
        "ke_external_per_vol": ke_ext / vol,
        "ke_internal_per_vol": ke_int / vol,
        "psi_max_sv": jnp.max(jnp.abs(state.psi0)) / SV_CGS,
    }
    if forcing is not None:
        area_u = (grid.csu[:, None] * grid.dyu[:, None]
                  * grid.dxu[None, :]) * umask[0]
        out["wind_work_per_area"] = jnp.sum(
            (forcing.smf[0] * u_full[0] + forcing.smf[1] * v_full[0])
            * area_u) / jnp.maximum(jnp.sum(area_u), 1.0)
    return out


# ----------------------------------------------------------------------
# tracer term balance (termbal.F ttb1, regional volume means)
# ----------------------------------------------------------------------

def tracer_term_balance(t_new, t_old, c2dt, region_masks, g, tmask):
    """Volume-averaged d(tracer)/dt per region (termbal.F ttb1 'dT/dt'
    row).  The reference accumulates every RHS term separately per
    region; the leading balance check — the net tendency per region —
    is computed here from the two time levels.  Individual RHS terms
    are available by calling the flux builders in
    models/ocean/kernels.py on a saved state.

    region_masks : (nreg, jmt, imt) horizontal region membership
    Returns (nreg, nt) volume-mean tendencies per second.
    """
    grid_vol = (g.cst[None, :, None] * g.dyt[None, :, None]
                * g.dxt[None, None, :] * g.dzt[:, None, None]) * tmask
    dtdt = (t_new - t_old) / c2dt                  # (nt, km, jmt, imt)
    vol_r = jnp.einsum("rji,kji->r", region_masks, grid_vol)
    num = jnp.einsum("rji,nkji,kji->rn", region_masks, dtdt, grid_vol)
    return num / jnp.maximum(vol_r, 1.0)[:, None]
