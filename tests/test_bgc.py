"""Biogeochemistry tests: NPZD sources, carbonate chemistry, coupled run."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import BgcConfig, small_config
from uvic_tpu.models.bgc.gasx import co2calc_sws, o2_saturation


def test_carbonate_chemistry_reference_values():
    # canonical surface ocean: DIC=2.0, ALK=2.3 mol/m3, T=20C, S=35
    out = co2calc_sws(jnp.asarray(20.0), jnp.asarray(35.0),
                      jnp.asarray(2.0), jnp.asarray(2.3), 280.0)
    assert 8.0 < float(out["ph"]) < 8.25
    assert 250 < float(out["pco2"]) < 400
    # colder water holds more CO2 (lower pCO2 at same DIC)
    out_cold = co2calc_sws(jnp.asarray(2.0), jnp.asarray(35.0),
                           jnp.asarray(2.0), jnp.asarray(2.3), 280.0)
    assert float(out_cold["pco2"]) < float(out["pco2"])


def test_o2_saturation_values():
    # ~231 mmol/m3 at 20C/35psu; more soluble in cold water
    o2_20 = float(o2_saturation(jnp.asarray(20.0), jnp.asarray(35.0)))
    o2_0 = float(o2_saturation(jnp.asarray(0.0), jnp.asarray(35.0)))
    assert 0.22 < o2_20 < 0.24
    assert o2_0 > o2_20


@pytest.fixture(scope="module")
def bgc_model():
    from uvic_tpu.coupler.driver import CoupledModel
    cfg = small_config()
    cfg = cfg.replace(
        ocean=dataclasses.replace(
            cfg.ocean, isopycmix=False, gent_mcwilliams=False,
            dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8),
        bgc=BgcConfig(suite="npzd", carbon=True, alk=True, o2=True,
                      nitrogen=True))
    return CoupledModel(cfg)


def test_npzd_coupled_run(bgc_model):
    m = bgc_model
    assert m.ocean.nt == 11
    assert m.ocean.tracer_index.names == [
        "temp", "salt", "dic", "alk", "o2", "po4", "phyt", "zoop",
        "detr", "no3", "diaz"]
    state = m.init_state()
    state = m.run(state, 4)   # 20 model days
    tmask = np.asarray(m.ocean.tmask) > 0
    for i, nm in enumerate(m.ocean.tracer_index.names):
        arr = np.asarray(state.ocean.t[i])[tmask]
        assert np.isfinite(arr).all(), nm
    idx = m.ocean.tracer_index
    t = np.asarray(state.ocean.t)
    # tracers stay in physical ranges
    assert 2.0 < t[idx.idic][tmask].max() < 3.0
    assert 0.05 < t[idx.io2][tmask].max() < 0.4
    assert t[idx.iphyt][tmask].min() > 0.0      # positivity (trcmin flags)
    assert t[idx.ipo4][tmask].min() > 0.0
    # biology is active: phytoplankton grew somewhere
    assert t[idx.iphyt][tmask].max() > 0.15
