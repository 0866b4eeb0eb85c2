"""Barotropic streamfunction mode.

TPU-native re-design of source/mom/tropic.F: the 1994 Goldberg
finite-difference stream function formulation.  The forcing curl
(`sfforc`, tropic.F:298-395) runs per step on device; the 5-point
operator coefficients (`sfc5pt`, tropic.F:397-557) depend only on the
grid, hr and 1/c2dtsf, so with explicit Coriolis (acor=0) they are
precomputed once at unit timestep and scaled at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ops.solvers import IslandIndex, congrad
from ...ops.stencil import S, W

# partial-difference coefficient tables (tropic.F:350-369)
_CDDXU = {(0, 0): -0.5, (0, 1): -0.5, (1, 0): 0.5, (1, 1): 0.5}
_CDDYU = {(0, 0): -0.5, (0, 1): 0.5, (1, 0): -0.5, (1, 1): 0.5}
_CDDXT = {(-1, -1): -0.5, (-1, 0): -0.5, (0, -1): 0.5, (0, 0): 0.5}
_CDDYT = {(-1, -1): -0.5, (-1, 0): 0.5, (0, -1): -0.5, (0, 0): 0.5}


def sfforc(zu, dxu, dyu, csu):
    """Streamfunction forcing: discrete curl of the depth-averaged
    momentum forcing (tropic.F:298-395). zu is (2, jmt, imt)."""
    ustuff = zu[0] * (dxu[None, :] * csu[:, None])
    vstuff = zu[1] * dyu[:, None]
    forc = jnp.zeros_like(ustuff)
    for (i1, j1), cy in _CDDYT.items():
        cx = _CDDXT[(i1, j1)]
        shifted_u = jnp.roll(ustuff, (-j1, -i1), axis=(0, 1))
        shifted_v = jnp.roll(vstuff, (-j1, -i1), axis=(0, 1))
        forc = forc - cy * shifted_u + cx * shifted_v
    forc = forc.at[0, :].set(0.0).at[-1, :].set(0.0)
    forc = forc.at[:, 0].set(0.0).at[:, -1].set(0.0)
    return forc


def sfc9pt_unit(dxu, dyu, csu, hr, f=None, acor=0.0):
    """9-point operator coefficients at c2dtsf=1 (sfc9pt,
    tropic.F:560-717): the exact discrete curl-of-response operator
    (no corner lumping — the identity A = curl o ext holds)."""
    jmt, imt = hr.shape
    ustuff = (dxu[None, :] * csu[:, None]) * hr / dyu[:, None]
    vstuff = dyu[:, None] * hr / (dxu[None, :] * csu[:, None])

    def shifted(a, i2, j2):
        out = np.zeros_like(a)
        out[1:jmt - 1, 1:imt - 1] = a[1 + j2:jmt - 1 + j2,
                                      1 + i2:imt - 1 + i2]
        return out

    cf = np.zeros((3, 3, jmt, imt))
    for (i1, j1), cyu in _CDDYU.items():
        cxu = _CDDXU[(i1, j1)]
        for (i2, j2), cyt in _CDDYT.items():
            cxt = _CDDXT[(i2, j2)]
            cf[j1 + j2 + 1, i1 + i2 + 1] += (
                cyu * cyt * shifted(ustuff, i2, j2)
                + cxu * cxt * shifted(vstuff, i2, j2))

    cf_acor = np.zeros_like(cf)
    if acor != 0.0:
        ustuff_a = acor * hr * (-f)
        vstuff_a = acor * hr * (+f)
        for (i1, j1), cxu in _CDDXU.items():
            cyu = _CDDYU[(i1, j1)]
            for (i2, j2), cyt in _CDDYT.items():
                cxt = _CDDXT[(i2, j2)]
                cf_acor[j1 + j2 + 1, i1 + i2 + 1] -= (
                    cxu * cyt * shifted(ustuff_a, i2, j2)
                    + cyu * cxt * shifted(vstuff_a, i2, j2))
    return cf, cf_acor


def sfc5pt_unit(dxu, dyu, csu, hr, f=None, acor=0.0):
    """5-point operator coefficients at c2dtsf=1 (tropic.F:397-557).

    Returns (3, 3, jmt, imt) NumPy array indexed [dj+1, di+1]; the true
    operator is cf/c2dtsf + (acor Coriolis augmentation, which is
    timestep-independent and returned separately when acor != 0).
    """
    jmt, imt = hr.shape
    ustuff = (dxu[None, :] * csu[:, None]) * hr / dyu[:, None]
    vstuff = dyu[:, None] * hr / (dxu[None, :] * csu[:, None])

    def shifted(a, i2, j2):
        out = np.zeros_like(a)
        js = slice(1, jmt - 1)
        isl = slice(1, imt - 1)
        # value at (i+i2, j+j2) for interior (j,i)
        out[js, isl] = a[1 + j2:jmt - 1 + j2, 1 + i2:imt - 1 + i2]
        return out

    cf = np.zeros((3, 3, jmt, imt))
    for (i1, j1), cyu in _CDDYU.items():
        for (i2, j2), cyt in _CDDYT.items():
            cf[j1 + j2 + 1, 0 + 1] += cyu * cyt * shifted(ustuff, i2, j2)
    for (i1, j1), cxu in _CDDXU.items():
        for (i2, j2), cxt in _CDDXT.items():
            cf[0 + 1, i1 + i2 + 1] += cxu * cxt * shifted(vstuff, i2, j2)

    cf_acor = np.zeros_like(cf)
    if acor != 0.0:
        ustuff_a = acor * hr * (-f)
        vstuff_a = acor * hr * (+f)
        for (i1, j1), cxu in _CDDXU.items():
            for (i2, j2), cyt in _CDDYT.items():
                cf_acor[j1 + j2 + 1, i1 + i2 + 1] -= (
                    cxu * cyt * shifted(ustuff_a, i2, j2))
        for (i1, j1), cyu in _CDDYU.items():
            for (i2, j2), cxt in _CDDXT.items():
                cf_acor[j1 + j2 + 1, i1 + i2 + 1] -= (
                    cyu * cxt * shifted(vstuff_a, i2, j2))
    return cf, cf_acor


def tropic_step(zu, psi0, psi1, ptd_hist, ptdb_hist, cf_unit, cf_acor,
                isl: IslandIndex, dxu, dyu, csu, c2dtsf, tolrsf, mxscan,
                leapfrog: bool, cyclic=True, filt=None, euler2=False,
                save_ptd=True, solver=None, npt=5):
    """Solve for the change in streamfunction and update the two psi time
    levels (tropic.F:127-293).

    filt: optional ZonalFilter for high-latitude filtering of the
    forcing (filz, tropic.F:136-141).
    Returns (psi0_new, psi1_new, ptd_new, ptdb_new, iterations, est_err,
    converged).
    """
    forc = sfforc(zu, dxu, dyu, csu)
    if filt is not None:
        forc = filt(forc)
    if npt == 9:
        # the 9-point operator annihilates the checkerboard mode as well
        # as constants (diagonal-difference construction): deflate the
        # forcing, guess, and solution so nothing drifts along it
        jmt, imt = forc.shape
        jj = jnp.arange(jmt)[:, None]
        ii = jnp.arange(imt)[None, :]
        cb = ((-1.0) ** (jj + ii)).astype(forc.dtype)
        w = cb.at[0, :].set(0.0).at[-1, :].set(0.0) \
            .at[:, 0].set(0.0).at[:, -1].set(0.0)
        ww = jnp.sum(w * w)

        def deflate(x):
            return x - (jnp.sum(x * w) / ww) * w

        forc = deflate(forc)
    else:
        def deflate(x):
            return x

    # initial guess extrapolated from the last two solutions
    if isinstance(leapfrog, bool):
        fxa = 1.0 if leapfrog else 0.5
    else:
        fxa = jnp.where(leapfrog, 1.0, 0.5).astype(zu.dtype)
    guess = deflate(fxa * (2.0 * ptd_hist - ptdb_hist))
    if cyclic:
        guess = guess.at[:, 0].set(guess[:, -2]).at[:, -1].set(guess[:, 1])

    if solver is not None:
        # fused single-kernel CG (ops/pallas_cg.py)
        ptd, iters = solver(guess, forc, c2dtsf, tolrsf)
        est = jnp.zeros_like(c2dtsf + jnp.asarray(0.0, zu.dtype))
        converged = iters < mxscan
    else:
        cf = cf_unit / c2dtsf + cf_acor
        ptd, iters, est, converged = congrad(
            cf, guess, forc, isl, tolrsf, mxscan, cyclic)

    ptd = deflate(ptd)

    # normalize psi to zero on the main land mass (tropic.F:233-237)
    if isl.nisle > 0 and isl.imain >= 0:
        main_sum = jnp.where(isl.perim_id == isl.imain, ptd, 0.0)
        dpsi1 = jnp.sum(main_sum) / isl.counts[isl.imain]
        ptd = jnp.where(isl.ocean_mask > 0, ptd - dpsi1, ptd)

    # psi level update (tropic.F:256-270)
    if euler2:
        # 2nd Euler-backward pass: overwrite psi(1), keep psi(2)
        psi0_new = psi1 + ptd
        psi1_new = psi1
    else:
        psi0_new = psi1 + ptd
        psi1_new = psi0

    # save solution history for next step's guess (tropic.F:275-293);
    # the 1st Euler-backward pass skips the save
    if not save_ptd:
        return psi0_new, psi1_new, ptd_hist, ptdb_hist, iters, est, converged
    if isinstance(leapfrog, bool):
        ptd_save = ptd if leapfrog else 2.0 * ptd
    else:
        ptd_save = jnp.where(leapfrog, ptd, 2.0 * ptd)
    return psi0_new, psi1_new, ptd_save, ptd_hist, iters, est, converged


def ext_mode_velocity(psi, hr, dxu2r, dyu2r, csur):
    """External-mode velocity from the streamfunction at a given time
    level (loadmw.F:624-640 add_ext_mode):

    uext = -(d psi / dy)/H,  vext = (d psi / dx)/(H cos)
    on the B-grid via the two diagonal differences."""
    from ...ops.stencil import E, N
    diag1 = N(E(psi)) - psi
    diag0 = N(psi) - E(psi)
    uext = -(diag1 + diag0) * dyu2r[:, None] * hr
    vext = (diag1 - diag0) * dxu2r[None, :] * csur[:, None] * hr
    return uext, vext
