"""EMBM atmosphere tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.core.grid import make_grid
from uvic_tpu.core.topog import idealized_kmt, make_topography
from uvic_tpu.models.embm.insolation import (annual_mean_insolation,
                                             daily_insolation)
from uvic_tpu.models.embm.model import EmbmModel


@pytest.fixture(scope="module")
def embm():
    cfg = small_config()
    grid = make_grid(cfg.grid)
    topo = make_topography(grid, idealized_kmt(grid, "world"))
    return EmbmModel(grid, topo, cfg.embm)


def _sst(grid):
    lat = np.broadcast_to(grid.yt[:, None], (grid.jmt, grid.imt))
    return jnp.asarray(np.clip(25.0 * np.cos(np.deg2rad(lat)) ** 2,
                               -1.8, None))


def test_insolation_climatology():
    lat = jnp.deg2rad(jnp.array([-90.0, -45.0, 0.0, 45.0, 90.0]))
    q = annual_mean_insolation(lat)
    wm2 = np.asarray(q) * 1e-3
    # annual means: ~420 W/m2 equator, ~170-180 W/m2 poles
    assert 400 < wm2[2] < 440
    assert 150 < wm2[0] < 200 and 150 < wm2[4] < 200
    # polar night: zero insolation at the winter pole
    q_jan = daily_insolation(jnp.deg2rad(jnp.array([89.0])), 10.0)
    assert float(q_jan[0]) == 0.0


def test_embm_equilibrates(embm):
    state = embm.init_state()
    sst = _sst(embm.grid)
    for _ in range(200):
        state, diag = embm.step(state, sst)
    sat = np.asarray(state.at[0])[1:-1, 1:-1]
    # earthlike: warm tropics, cold poles, bounded everywhere
    assert sat.max() < 60.0 and sat.min() > -90.0
    assert not np.isnan(sat).any()
    q = np.asarray(state.at[1])
    assert q.min() >= 0.0 and q.max() < 0.05
    # hydrological cycle active
    assert float(diag.precip.max()) > 0.0
    assert float(diag.evap.max()) > 0.0
    # relative humidity capped at rhmax after precipitation
    assert float(diag.rh.max()) <= 1.0 + 1e-12


def test_transport_conserves_with_zero_forcing(embm):
    """The implicit transport operator conserves the area integral when
    advection is divergence-free and diffusion has closed boundaries."""
    state = embm.init_state()
    dts = 2.0 * embm.cfg.dtatm
    coefs = embm._coef(embm.diff_n, dts)
    x = embm._bc(state.at[0])
    x = embm.solve_tracer(x, x, coefs, 1e-12, 500)
    assert not bool(jnp.isnan(x).any())
