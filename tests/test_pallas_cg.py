"""Fused Pallas CG vs the jnp congrad on identical island geometry.

Runs in interpret mode so it exercises the exact kernel program on CPU
(conftest forces the cpu backend).  The nonzero warm-start guess case is
the one that historically diverged: with a fixed trip count, un-frozen
post-convergence state updates overflow and poison dpsi with NaN.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from uvic_tpu.config import small_config
from uvic_tpu.models.ocean.model import make_ocean
from uvic_tpu.ops.pallas_cg import make_pallas_congrad
from uvic_tpu.ops.solvers import congrad, make_inv


def _solver_pair():
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False))
    m = make_ocean(cfg)
    topo = m.params.topo
    jmt, imt = topo.hr.shape
    pid = np.asarray(topo.perim_id)
    nisle = max(topo.nisle, 1)
    oh = np.stack([(pid == k).astype(np.float64) for k in range(nisle)])
    interior = np.zeros((jmt, imt))
    interior[1:-1, 1:-1] = 1.0
    pm = (pid >= 0).astype(np.float64)
    z_unit = np.asarray(make_inv(m.cf_unit, m.isl))
    solver = make_pallas_congrad(
        np.asarray(m.cf_unit), z_unit, oh,
        np.asarray(topo.perim_count), interior, pm,
        imt, jmt, cfg.ocean.mxscan, m.params.grid.cyclic,
        interpret=True)
    return m, solver


def test_pallas_cg_matches_congrad():
    m, solver = _solver_pair()
    g = m.params.grid
    c2dtsf = 2.0 * m.cfg.ocean.dtsf
    rng = np.random.default_rng(7)
    omask = np.asarray(m.isl.ocean_mask)
    interior = np.zeros_like(omask)
    interior[1:-1, 1:-1] = 1.0
    forc = jnp.asarray(rng.normal(size=omask.shape) * omask * interior)
    cf = m.cf_unit / c2dtsf + m.cf_acor

    # pilot solve to learn the solution scale, then a tolerance both
    # solvers converge to well before mxscan (real runs use tolrsf on
    # psi ~ 1e13 the same way); unconverged CG pairs drift apart along
    # the operator's null modes and are not comparable
    pilot, *_ = congrad(cf, jnp.zeros_like(forc), forc, m.isl,
                        1e-30, m.cfg.ocean.mxscan, g.cyclic)
    tol = 1e-7 * float(jnp.abs(pilot).max())

    for trial, guess_np in enumerate([
            np.zeros_like(omask),
            np.asarray(pilot) * 0.9]):
        guess = jnp.asarray(guess_np)
        ref, it_ref, est, conv = congrad(
            cf, guess, forc, m.isl, tol, m.cfg.ocean.mxscan, g.cyclic)
        got, it_got = solver(guess, forc, jnp.asarray(c2dtsf),
                             jnp.asarray(tol))
        assert not bool(jnp.isnan(got).any()), f"trial {trial}: NaN"
        err = float(jnp.abs(got - ref).max())
        scale = float(jnp.abs(ref).max()) + 1e-30
        assert err <= 1e-4 * scale, \
            f"trial {trial}: err {err} vs scale {scale}"
        assert abs(int(it_got) - int(it_ref)) <= 5
