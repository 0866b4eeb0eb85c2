"""MOBI multi-segment inventory bounds (VERDICT r2 weak #9).

The failure mode this guards: slow drift/blowup in the 41-tracer
coupled system that 2-substep process tests cannot see.  Two months of
coupled segments with full MOBI; every tracer inventory must stay
bounded, positive-definite tracers must stay non-negative (post-FCT),
and conserved-family inventories (P, N) must drift only through their
boundary terms.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import mobi_full, small_config
from uvic_tpu.coupler.driver import CoupledModel


def test_mobi_inventories_bounded():
    cfg = small_config()
    cfg = cfg.replace(
        ocean=dataclasses.replace(
            cfg.ocean, isopycmix=False, gent_mcwilliams=False,
            dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8),
        bgc=mobi_full(),
        sed=dataclasses.replace(cfg.sed, enabled=True))
    m = CoupledModel(cfg)
    g = m.grid
    dvol = (np.asarray(g.dzt)[:, None, None]
            * np.asarray(g.cst)[None, :, None]
            * np.asarray(g.dyt)[None, :, None]
            * np.asarray(g.dxt)[None, None, :]) \
        * np.asarray(m.ocean.tmask)
    dvol[:, :, 0] = 0.0
    dvol[:, :, -1] = 0.0

    def inv(state):
        return np.einsum("nkji,kji->n", np.asarray(state.ocean.t), dvol)

    state = m.init_state()
    inv0 = inv(state)
    state = m.run(state, 12)   # 60 model days
    inv1 = inv(state)
    names = [tr.name for tr in m.ocean.tracer_index.tracers]

    assert not bool(jnp.isnan(state.ocean.t).any())
    t = np.asarray(state.ocean.t)
    wet = np.asarray(m.ocean.tmask) > 0
    idx = m.ocean.tracer_index
    # slow reservoirs: boundary fluxes move these by at most a few %
    # in 60 days; more is a kinetics/coupling bug
    slow = ("temp", "dic", "c14", "alk", "o2", "po4", "no3", "sil",
            "dic13")
    for k, name in enumerate(names):
        assert np.isfinite(inv1[k]), name
        scale = abs(inv0[k]) + 1e-30
        if name in slow and abs(inv0[k]) > 0:
            assert abs(inv1[k] - inv0[k]) / scale < 0.2, \
                (name, inv0[k], inv1[k])
        # fast pools (plankton/detritus/iron) redistribute freely from
        # the unspun uniform IC (deep phyt dies into detr/po4), so no
        # own-scale bound applies — the element-closure checks below
        # are the real instrument; still require boundedness vs the
        # whole bio budget
        assert abs(inv1[k]) < 1.0e25, (name, inv1[k])
        # positive-definite bgc tracers stay essentially non-negative
        if name not in ("temp", "salt") and "15" not in name \
                and "13" not in name:
            assert t[k][wet].min() > -1e-6 * max(t[k][wet].max(), 1e-12), \
                (name, float(t[k][wet].min()))

    # total-phosphorus closure: what the plankton lose returns to po4
    # (variable-stoichiometry P pools; virtual fluxes move little P in
    # 60 days) — the instrument for slow-leak kinetics bugs
    def ptotal(v):
        tot = v[idx["po4"]] + v[idx["phyt_phos"]] + v[idx["detr_phos"]]
        # fixed-ratio P content of the N-unit pools (redptn = 1/16)
        for nm in ("zoop", "diaz"):
            if nm in idx:
                tot = tot + v[idx[nm]] / 16.0
        return tot

    p0, p1 = ptotal(inv0), ptotal(inv1)
    assert abs(p1 - p0) / (abs(p0) + 1e-30) < 0.05, (p0, p1)
