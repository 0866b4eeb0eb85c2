"""Full-budget conservation audits (global_sums.F:74-460 analog).

The ocean closure check is the coupling-plumbing instrument: the change
of every tracer inventory over N steps must equal the area-integrated
boundary fluxes the coupler applied (the tracer step is flux-form
conservative; convection, FCT, GM/Redi and implicit vertical diffusion
all redistribute without creating inventory).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.coupler.driver import CoupledModel
from uvic_tpu.diag.conservation import FullAudit


@pytest.fixture(scope="module")
def coupled():
    cfg = small_config()
    cfg = cfg.replace(
        ocean=dataclasses.replace(
            cfg.ocean, isopycmix=False, gent_mcwilliams=False,
            dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8,
            fourfil=False),
        land=dataclasses.replace(cfg.land, enabled=True))
    return CoupledModel(cfg)


def test_ocean_flux_closure(coupled):
    """d(inventory)/dt == sum(applied boundary fluxes), per tracer."""
    m = coupled
    audit = FullAudit(m)
    state = m.init_state()
    # spin one segment to get physically active forcing
    state = m.run_segment(state)

    from uvic_tpu.models.ocean.model import make_forcing
    g = m.grid
    yu = np.asarray(g.yu)
    taux = np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    smf = jnp.asarray(np.stack([taux / 1.035, np.zeros_like(taux)]))
    stf = np.zeros((m.ocean.nt, g.jmt, g.imt))
    stf[0] = 1.0e-5 * np.cos(np.deg2rad(
        np.broadcast_to(g.yt[:, None], (g.jmt, g.imt))))
    stf[1] = -2.0e-8
    stf *= np.asarray(m.topo.tmask[0])
    forcing = make_forcing(smf, jnp.asarray(stf))

    before_t = np.asarray(state.ocean.t)   # snapshot: step() donates
    ocean = state.ocean
    nsteps = 4
    for _ in range(nsteps):
        ocean = m.ocean.step(ocean, forcing, leapfrog=False)

    errs = audit.ocean_closure(before_t, ocean.t, forcing, nsteps,
                               m.cfg.ocean.dtts)
    # temp/salt have strong applied fluxes: tight closure
    assert abs(errs["temp"]) < 5e-2, errs
    assert abs(errs["salt"]) < 5e-2, errs


def test_full_inventories(coupled):
    """Five-reservoir inventories are finite and respond to a segment
    (global_sums.F totals)."""
    m = coupled
    audit = FullAudit(m)
    state = m.init_state()
    inv0 = audit.inventories(state, co2ccn=m.co2ccn)
    for k, v in inv0.items():
        assert np.isfinite(v), (k, v)
    assert inv0["ocn_heat_J"] > 0
    assert inv0["atm_water_kg"] > 0
    assert inv0["atm_carbon_kg"] > 0

    state = m.run_segment(state)
    inv1 = audit.inventories(state, co2ccn=m.co2ccn)
    for k, v in inv1.items():
        assert np.isfinite(v), (k, v)
    assert inv1["ice_water_kg"] >= 0.0


def test_atm_water_step_closure(coupled):
    """One forward atm+ice step: the water leaving the atmosphere/ice/
    soil reservoirs equals the freshwater delivered to the ocean
    (global_sums.F water budget; measured residual 0.13%, dominated by
    the BiCGSTAB tolerance and the rhmax clipping bookkeeping)."""
    from uvic_tpu.models.embm import constants as C
    m = coupled
    audit = FullAudit(m)
    state = m.run_segment(m.init_state())   # settle the cold start

    sst, sss, frzpt = m.gasbc(state)
    u = m.ocean.full_velocity(state.ocean.u, state.ocean.psi0)
    area = audit.area

    def water(atm, ice):
        aw = float(jnp.sum(atm.at[1] * area)) * C.RHOATM * C.SHQ * 1e-3
        iw = (float(jnp.sum(ice.hice * ice.aice * area))
              * C.RHOICE * 1e-3
              + float(jnp.sum(ice.hsno * area)) * C.RHOSNO * 1e-3)
        sw = float(jnp.sum(atm.soilm * m.embm.lmsk * area)) * 1e-3
        return aw + iw + sw

    atm1, ice1, acc, _ = m._atm_ice_step(
        state.atm, state.ice, sst, frzpt, u[0, 0], u[1, 0],
        jnp.asarray(0.0, sst.dtype), None, None, None, None, None,
        mixing=True)
    d_reservoirs = water(atm1, ice1) - water(state.atm, state.ice)
    delivered = float(jnp.sum(acc["freshwater"] * area * m.embm.tmsk)
                      ) * 1e-3
    resid = d_reservoirs + delivered
    assert abs(resid) < 5e-3 * (abs(delivered) + 1e3), \
        (d_reservoirs, delivered, resid)


def test_deterministic_audit_bitwise_under_sharding():
    """ConservationAudit(deterministic=True) yields BITWISE-identical
    inventories whether the state is sharded over a (2,4) or (1,8)
    mesh or unsharded: column partials are computed on device (the k
    axis is never sharded), the horizontal sum runs host-side in fixed
    order (SURVEY row 64 deterministic-reduction option)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uvic_tpu.config import small_config
    from uvic_tpu.diag.conservation import ConservationAudit
    from uvic_tpu.models.ocean.model import make_ocean
    from uvic_tpu.parallel.mesh import make_mesh, shard_pytree

    cfg = small_config(imt=34, jmt=34, km=8)
    m = make_ocean(cfg)
    g = m.params.grid
    rng = np.random.default_rng(3)
    t0 = rng.standard_normal((2, g.km, g.jmt, g.imt)) \
        * np.asarray(m.params.topo.tmask)
    state = m.init_state(t0)
    audit = ConservationAudit(m, deterministic=True)
    ref = audit.inventories(state)
    for shape in ((2, 4), (1, 8)):
        mesh = make_mesh(shape)
        s = shard_pytree(state, mesh)
        got = audit.inventories(s)
        for k in ref:
            assert got[k] == ref[k], (k, got[k], ref[k])
