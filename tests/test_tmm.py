"""Transport-matrix extraction: linearity and conservation checks."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from uvic_tpu.config import small_config
from uvic_tpu.diag.tmm import (extract_matrices,
                               sheets_to_sparse_vertical,
                               tiles_to_sparse)
from uvic_tpu.models.ocean.model import make_forcing, make_ocean

SPACING = (3, 4, 4)   # small grid: 32 physical columns, centered adv


def _model():
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=3600.0, dtuv=900.0, dtsf=900.0, tolrsf=1e8,
        tracer_advection="centered"))
    m = make_ocean(cfg)
    g = m.params.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m.params.topo.tmask)
    yu = np.asarray(g.yu)
    taux = np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    f = make_forcing(jnp.asarray(np.stack([taux / 1.035,
                                           np.zeros_like(taux)])),
                     jnp.zeros((m.nt, g.jmt, g.imt)))
    s = m.run(m.init_state(t0), f, 10)
    return m, s, f


def test_tmm_matrix_reproduces_kernel():
    m, s, f = _model()
    g = m.params.grid
    aexp, aimp, tiles = extract_matrices(m, s, f, spacing=SPACING)
    tmask = np.asarray(m.tmask)
    A = tiles_to_sparse(aexp, tiles, tmask, spacing=SPACING)

    wet = tmask > 0
    wetp = wet.copy()
    wetp[..., 0] = False
    wetp[..., -1] = False
    assert A.shape == (int(wetp.sum()),) * 2

    # centered advection + diffusion is linear: A @ x must equal the
    # kernel's tendency on an arbitrary (setbcx-consistent) field
    from uvic_tpu.models.ocean.kernels import adv_vel, tracer_step
    from uvic_tpu.ops.stencil import setbcx
    rng = np.random.default_rng(3)
    x3 = rng.normal(size=tmask.shape) * tmask
    x3 = np.asarray(setbcx(jnp.asarray(x3), True))
    u_tau = m.full_velocity(s.u, s.psi0)
    vet, vnt, vbt, *_ = adv_vel(u_tau[0], u_tau[1], m.g, m.cyclic)
    zs = jnp.zeros((1, g.jmt, g.imt))
    out = tracer_step(
        jnp.asarray(x3)[None], jnp.asarray(x3)[None], vet, vnt, vbt,
        zs, zs, None, m.diff_cbt, m.kmt, m.tmask, m.g,
        2 * m.cfg.ocean.dtts, "centered", 0.0, m.cyclic, iso=None)
    tend = (np.asarray(out[0]) - x3) / (2 * m.cfg.ocean.dtts)

    got = np.zeros_like(x3)
    got[wetp] = A @ x3[wetp]
    err = np.abs(got - tend)[wetp].max()
    scale = np.abs(tend).max() + 1e-30
    assert err < 1e-8 * scale, f"err {err} scale {scale}"


def test_tmm_implicit_row_sums():
    m, s, f = _model()
    aexp, aimp, tiles = extract_matrices(m, s, f, spacing=SPACING)
    tmask = np.asarray(m.tmask)
    Ai = sheets_to_sparse_vertical(aimp, tmask)
    # implicit vertical diffusion with zero-flux BCs redistributes a
    # constant profile onto itself: rows sum to 1
    rs = np.asarray(Ai.sum(axis=1)).ravel()
    assert np.abs(rs - 1.0).max() < 1e-8
