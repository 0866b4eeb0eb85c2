"""Ocean heat-closure bisection: which config feature breaks
d(inventory) == applied-flux on the earth config?

Runs the ocean alone on the earth topography with a fixed surface
forcing for N tracer steps, per feature-toggle variant, and prints the
relative closure error for temp/salt (audit.ocean_closure).

Usage: python scripts/probe_closure.py
"""

import dataclasses
import json
import sys

sys.path.insert(0, ".")

import numpy as np

import uvic_tpu

uvic_tpu.enable_compile_cache()


def run_variant(name, **ocean_over):
    import jax.numpy as jnp
    from uvic_tpu.config import ModelConfig
    from uvic_tpu.coupler.driver import CoupledModel
    from uvic_tpu.diag.conservation import FullAudit
    from uvic_tpu.models.ocean.model import make_forcing

    cfg = ModelConfig().replace(dtype="float32")
    base = dict(isopycmix=True, gent_mcwilliams=True, tidal_kv=True,
                gthflx=True, aniso_visc=True, aniso_zonal=True)
    base.update(ocean_over)
    cfg = cfg.replace(
        ocean=dataclasses.replace(cfg.ocean, **base),
        embm=dataclasses.replace(cfg.embm, seasonal=True))
    m = CoupledModel(cfg, topo_kind="earth")
    audit = FullAudit(m)
    state = m.init_state()

    g = m.grid
    # realistic-magnitude fixed forcing
    yu = np.asarray(g.yu)
    taux = np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    smf = jnp.asarray(np.stack([taux / 1.035, np.zeros_like(taux)]),
                      m.cfg.np_dtype)
    stf = np.zeros((m.ocean.nt, g.jmt, g.imt))
    stf[0] = -4.0e-6 * np.ones((g.jmt, g.imt))   # ~ -17 W/m^2 cooling
    stf[1] = -2.0e-8
    stf *= np.asarray(m.topo.tmask[0])
    forcing = make_forcing(smf, jnp.asarray(stf, m.cfg.np_dtype))

    nsteps = 24
    ocean = state.ocean
    before_t = np.asarray(ocean.t, np.float64)
    for i in range(nsteps):
        ocean = m.ocean.step(ocean, forcing,
                             leapfrog=(i % m.cfg.ocean.nmix != 0))
    errs = audit.ocean_closure(before_t, ocean.t, forcing, nsteps,
                               m.cfg.ocean.dtts)
    print(json.dumps(dict(variant=name,
                          temp=round(errs["temp"], 5),
                          salt=round(errs["salt"], 5))), flush=True)


if __name__ == "__main__":
    run_variant("earth-full")
    run_variant("no-fourfil", fourfil=False)
    run_variant("no-isopyc", isopycmix=False, gent_mcwilliams=False)
    run_variant("no-tidal", tidal_kv=False, gthflx=False)
    run_variant("no-aniso", aniso_visc=False, aniso_zonal=False)
    run_variant("bare", fourfil=False, isopycmix=False,
                gent_mcwilliams=False, tidal_kv=False, gthflx=False,
                aniso_visc=False, aniso_zonal=False)
