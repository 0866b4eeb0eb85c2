"""Explicit-halo shard_map ocean step == single-device step.

The ShardedOceanStep packs all stencil state into one array, exchanges
halos ONCE per step (two ppermute pairs), and runs the unchanged
whole-domain kernels on halo-padded local blocks (SURVEY.md §7.2-8).
Every kept cell must compute exactly the global answer — the halo width
must exceed the full stencil composition depth, which these tests pin
down for both the plain and the isopycnal/GM configurations.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.parallel.mesh import make_mesh, shard_pytree
from uvic_tpu.parallel.shard_step import ShardedOceanStep


def _setup(isopyc, jmt=34, imt=40):
    from uvic_tpu.models.ocean.model import make_forcing, make_ocean
    cfg = small_config(imt=imt, jmt=jmt, km=8)
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=isopyc, gent_mcwilliams=isopyc,
        dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e0,
        mxscan=2000))
    m = make_ocean(cfg)
    g = m.params.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m.params.topo.tmask)
    state = m.init_state(t0)
    yu = np.asarray(g.yu)
    taux = np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    smf = np.stack([taux / 1.035, np.zeros_like(taux)])
    stf = np.zeros((m.nt, g.jmt, g.imt))
    forcing = make_forcing(jnp.asarray(smf), jnp.asarray(stf))
    primed = jax.tree_util.tree_map(
        np.asarray, m.step(state, forcing, leapfrog=False))
    return m, primed, forcing


@pytest.mark.parametrize("isopyc,shape,halo,imt", [
    (False, (2, 4), 8, 40),
    # 8-way x split: each shard must own halo + trailing-ghost columns
    # (w + gx <= lx), so the x extent is 56 here
    (False, (1, 8), 5, 56),
    (True, (2, 2), 10, 40),
])
def test_shardmap_step_equivalence(isopyc, shape, halo, imt):
    """Tolerances are a MEASURED error budget, not slack:

    - tracers/halo machinery: exact to round-off (atol 1e-11) — the one
      aggregated exchange reproduces the whole-domain stencils bitwise
      for the first steps.
    - psi: the barotropic CG (deflated; runs replicated under sharding)
      converges to round-off stagnation in BOTH paths, so the two
      solutions each sit within kappa_eff*eps*|psi| ~ 1e-6 relative of
      the true solution (kappa_eff ~ 1e10 from hr and metric-term
      coefficient spread); two independently compiled programs land at
      different points inside that ball.
    - u: psi slack enters the internal mode through the nonlinear terms
      at ~1e-7 relative over 3 steps (measured 3.5e-7 max rel).
    """
    assert len(jax.devices()) >= 8
    m, primed, forcing = _setup(isopyc, imt=imt)
    nsteps = 3

    ref = jax.tree_util.tree_map(jnp.asarray, primed)
    step1 = jax.jit(lambda s, f: m._step(s, f, leapfrog=True))
    for _ in range(nsteps):
        ref = step1(ref, forcing)

    mesh = make_mesh(shape)
    ss = ShardedOceanStep(m, mesh, halo=halo)
    s8 = shard_pytree(jax.tree_util.tree_map(jnp.asarray, primed), mesh)
    f8 = shard_pytree(forcing, mesh)
    for _ in range(nsteps):
        s8 = ss.step(s8, f8, leapfrog=True)

    np.testing.assert_allclose(np.asarray(jax.device_get(s8.t)),
                               np.asarray(ref.t), rtol=1e-9, atol=1e-11)
    # solver-conditioning contract: psi within the stagnation ball
    psi_scale = float(jnp.abs(ref.psi0).max())
    assert float(jnp.abs(jax.device_get(s8.psi0)
                         - ref.psi0).max()) < 3e-5 * psi_scale
    np.testing.assert_allclose(np.asarray(jax.device_get(s8.u)),
                               np.asarray(ref.u), rtol=1e-5, atol=3e-7)


def test_shardmap_forward_step():
    """Mixing (forward) steps also agree."""
    m, primed, forcing = _setup(False)
    mesh = make_mesh((2, 4))
    ss = ShardedOceanStep(m, mesh, halo=8)

    ref = m._step(jax.tree_util.tree_map(jnp.asarray, primed), forcing,
                  leapfrog=False)
    s8 = shard_pytree(jax.tree_util.tree_map(jnp.asarray, primed), mesh)
    out = ss.step(s8, shard_pytree(forcing, mesh), leapfrog=False)
    np.testing.assert_allclose(np.asarray(jax.device_get(out.t)),
                               np.asarray(ref.t), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(jax.device_get(out.u)),
                               np.asarray(ref.u), rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("shape,halo", [((2, 4), 8), ((1, 8), 5)])
def test_shardmap_standard_grid(shape, halo):
    """The STANDARD 102x102 grid (size.h:27) shards on meshes that do
    not divide it: the window pads to (jmt_p, imt_p) with periodic
    image columns / beyond-wall rows (halo.pad_window) and the kept
    cells still compute the exact global answer."""
    m, primed, forcing = _setup(False, jmt=102, imt=102)
    nsteps = 2

    ref = jax.tree_util.tree_map(jnp.asarray, primed)
    step1 = jax.jit(lambda s, f: m._step(s, f, leapfrog=True))
    for _ in range(nsteps):
        ref = step1(ref, forcing)

    mesh = make_mesh(shape)
    ss = ShardedOceanStep(m, mesh, halo=halo)
    assert (ss.jmt_p, ss.imt_p) != (102, 102) or shape[1] == 1
    s8 = shard_pytree(jax.tree_util.tree_map(jnp.asarray, primed), mesh)
    f8 = shard_pytree(forcing, mesh)
    for _ in range(nsteps):
        s8 = ss.step(s8, f8, leapfrog=True)

    np.testing.assert_allclose(np.asarray(jax.device_get(s8.t)),
                               np.asarray(ref.t), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(jax.device_get(s8.u)),
                               np.asarray(ref.u), rtol=1e-7, atol=1e-9)


def test_required_halo_covers_hand_picked():
    """The derived halo width (stencil-composition law, size.h:80-100
    analog) must dominate every hand-validated value in this file."""
    from uvic_tpu.config import ModelConfig
    import dataclasses as _dc
    cfg = ModelConfig().ocean                       # FCT + isopyc
    assert ShardedOceanStep.required_halo(cfg) >= 10
    plain = _dc.replace(cfg, isopycmix=False, gent_mcwilliams=False,
                        tracer_advection="centered")
    assert ShardedOceanStep.required_halo(plain) >= 5
    fct = _dc.replace(cfg, isopycmix=False, gent_mcwilliams=False)
    assert ShardedOceanStep.required_halo(fct) >= 8


def test_shardmap_flagship_standard_grid_mobi():
    """Flagship-scale sharded equivalence (VERDICT r3 #6): the STANDARD
    102x102 grid with isopycnal/GM AND the full-MOBI tracer suite on a
    (2,4) virtual mesh, halo width DERIVED from the configured stencil
    depth, 3 leapfrog steps, tracer round-off tolerance."""
    import dataclasses as _dc
    from uvic_tpu.config import ModelConfig, mobi_full
    from uvic_tpu.models.ocean.model import make_forcing, make_ocean

    assert len(jax.devices()) >= 8
    cfg = ModelConfig()
    cfg = cfg.replace(
        ocean=_dc.replace(cfg.ocean, isopycmix=True,
                          gent_mcwilliams=True, dtts=43200.0,
                          dtuv=1800.0, dtsf=1800.0, tolrsf=1e0,
                          mxscan=2000),
        bgc=mobi_full())
    m = make_ocean(cfg)
    g = m.params.grid
    assert m.nt > 30
    t0 = np.zeros((m.nt, g.km, g.jmt, g.imt))
    vals = np.array([tr.init for tr in m.tracer_index.tracers])
    t0[:] = vals[:, None, None, None]
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m.params.topo.tmask)
    state = m.init_state(t0)
    yu = np.asarray(g.yu)
    taux = np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    smf = np.stack([taux / 1.035, np.zeros_like(taux)])
    stf = np.zeros((m.nt, g.jmt, g.imt))
    forcing = make_forcing(jnp.asarray(smf), jnp.asarray(stf))
    primed = m.step(state, forcing, leapfrog=False)

    nsteps = 3
    ref = primed
    step1 = jax.jit(lambda s, f: m._step(s, f, leapfrog=True))
    for _ in range(nsteps):
        ref = step1(ref, forcing)

    mesh = make_mesh((2, 4))
    ss = ShardedOceanStep(m, mesh)       # halo derived, not hand-picked
    assert ss.w == ShardedOceanStep.required_halo(cfg.ocean)
    s8 = shard_pytree(primed, mesh)
    f8 = shard_pytree(forcing, mesh)
    for _ in range(nsteps):
        s8 = ss.step(s8, f8, leapfrog=True)

    np.testing.assert_allclose(np.asarray(jax.device_get(s8.t)),
                               np.asarray(ref.t), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(jax.device_get(s8.u)),
                               np.asarray(ref.u), rtol=1e-5, atol=3e-7)
