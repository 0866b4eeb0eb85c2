"""Multi-device sharding equivalence (SURVEY.md §4e).

The virtual 8-device CPU mesh (conftest) validates that the GSPMD
sharded step reproduces the single-device step: the stencil halo
exchanges, the psum reductions in the CG dot products, and the
high-latitude filter matmuls must all commute with the domain
decomposition.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.parallel.mesh import make_mesh, shard_pytree, shard_step


def _ocean_setup(jmt=34, imt=40):
    from uvic_tpu.config import ModelConfig
    from uvic_tpu.models.ocean.model import make_forcing, make_ocean
    # tolrsf is an ABSOLUTE cgs residual (psi ~ 1e9 cm^3/s): a loose
    # tolerance lets the sharded and unsharded CG stop at different
    # iterates, so converge tightly for the equivalence check
    cfg = small_config(imt=imt, jmt=jmt, km=8)
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
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
    return m, state, forcing


@pytest.mark.parametrize("shape", [(2, 4), (1, 8)])
def test_ocean_step_sharded_equivalence(shape):
    """N steps on 1 device == N steps sharded over an 8-device mesh."""
    assert len(jax.devices()) >= 8
    m, state, forcing = _ocean_setup(jmt=2 * 17, imt=8 * 5)
    nsteps = 4

    # prime leapfrog levels once; snapshot to host so the donated
    # device buffers can be rebuilt for each run
    primed = jax.tree_util.tree_map(
        np.asarray, m.step(state, forcing, leapfrog=False))

    ref = jax.tree_util.tree_map(jnp.asarray, primed)
    step1 = jax.jit(lambda s, f: m._step(s, f, leapfrog=True))
    for _ in range(nsteps):
        ref = step1(ref, forcing)
    ref_t = np.asarray(ref.t)
    ref_psi = np.asarray(ref.psi0)

    mesh = make_mesh(shape)
    s8 = jax.tree_util.tree_map(jnp.asarray, primed)
    s8 = shard_pytree(s8, mesh)
    f8 = shard_pytree(forcing, mesh)
    step8 = shard_step(lambda s, f: m._step(s, f, leapfrog=True),
                       mesh, s8, f8)
    for _ in range(nsteps):
        s8 = step8(s8, f8)
    got_t = np.asarray(jax.device_get(s8.t))
    got_psi = np.asarray(jax.device_get(s8.psi0))

    # the elliptic solve's psum reduction order differs from the
    # single-device sum, so bitwise equality is not expected.  The
    # tracer trajectory closing to 1e-11 over nsteps is the real
    # equivalence statement.  psi is (a) defined up to an additive
    # constant (deflated null space) and (b) only determined to the
    # CG stopping tolerance, which in solution units is
    # tolrsf/||A|| ~ 1e-3 of the field scale here — compare de-meaned
    # at that solver-limited level.
    np.testing.assert_allclose(got_t, ref_t, rtol=1e-9, atol=1e-11)
    wet = np.asarray(m.params.topo.tmask)[0] > 0
    ref_c = ref_psi - ref_psi[wet].mean()
    got_c = got_psi - got_psi[wet].mean()
    scale = max(np.abs(ref_c).max(), 1.0)
    np.testing.assert_allclose(got_c[wet] / scale, ref_c[wet] / scale,
                               atol=5e-3)


def test_coupled_segment_sharded():
    """One FULL coupled segment (atm + ice + land + sed + ocean) with
    the state sharded over the 8-device mesh reproduces the unsharded
    segment."""
    from uvic_tpu.coupler.driver import CoupledModel
    cfg = small_config(imt=40, jmt=34, km=8)
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e0,
        mxscan=2000))
    m = CoupledModel(cfg)
    state0 = m.init_state()
    # snapshot: the jitted sub-steps donate their inputs
    host0 = jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, state0)

    def rebuild():
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if hasattr(a, "shape") else a,
            host0)

    ref = m.run_segment(rebuild())

    mesh = make_mesh((2, 4))
    s8 = shard_pytree(rebuild(), mesh)
    out = m.run_segment(s8)
    jax.block_until_ready(out.ocean.t)

    # ocean tracers inherit the barotropic solver's stopping slack
    # through one segment of velocity differences, and discrete
    # switches (FCT limiter, convection trigger) can amplify a
    # round-off difference at isolated cells — 1e-5 absolute catches
    # real decomposition bugs while tolerating those
    np.testing.assert_allclose(np.asarray(jax.device_get(out.ocean.t)),
                               np.asarray(ref.ocean.t),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.device_get(out.atm.at)),
                               np.asarray(ref.atm.at),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(jax.device_get(out.ice.hice)),
                               np.asarray(ref.ice.hice),
                               rtol=1e-9, atol=1e-11)


def test_deterministic_tsi_bitwise_across_meshes():
    """deterministic_reductions (VERDICT r4 #10): the SAME state laid
    out on a (1,1)-style replicated placement and on a (2,4) mesh must
    produce BIT-identical tsi scalars — the per-column device partials
    are mesh-invariant (k never sharded) and the horizontal sum runs
    on the host in fixed order."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from uvic_tpu.diag.tsi import TsiDiagnostics

    m, state, forcing = _ocean_setup()
    state = m.step(state, forcing, leapfrog=False)
    for _ in range(4):
        state = m.step(state, forcing, leapfrog=True)

    tsi = TsiDiagnostics(m, deterministic=True)
    row_single = tsi.compute(state)

    mesh = make_mesh((2, 4))
    spec = P(None, "y", "x")

    def shard(x):
        arr = jnp.asarray(x)
        if arr.ndim == 3:
            return jax.device_put(arr, NamedSharding(mesh, spec))
        if arr.ndim == 2:
            return jax.device_put(arr, NamedSharding(mesh, P("y", "x")))
        return arr

    state_sh = jax.tree_util.tree_map(shard, state)
    row_sharded = tsi.compute(state_sh)

    assert set(row_single) == set(row_sharded)
    for k in row_single:
        assert row_single[k] == row_sharded[k], \
            f"{k}: {row_single[k]!r} != {row_sharded[k]!r} (not bitwise)"
