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


def test_transport_operator_conserves(embm):
    """areaT A == areaT for the implicit transport operator on every
    physical cell: the flux-form upstream advection + diffusion must
    neither create nor destroy the area integral (solve.F coef).  The
    round-5 TOA reconciliation traced a ~2.2 W/m^2 planetary heat sink
    to row 1 being an identity equation while row 2 still fluxed into
    it (one-sided south-boundary leak)."""
    import jax

    G = embm.grid
    g = embm.g
    area = (np.asarray(G.cst)[:, None] * np.asarray(G.dyt)[:, None]
            * np.asarray(G.dxt)[None, :]).astype(np.float64)
    w = area.copy()
    w[:, 0] = 0.0
    w[:, -1] = 0.0
    w[0, :] = 0.0
    w[-1, :] = 0.0
    dts = 2.0 * embm.cfg.dtatm
    for diff in (embm.diff_t, embm.diff_q):
        coefs = embm._coef(diff, dts)

        def mv(x):
            return embm._transport_matvec(x, coefs)

        _, vjp = jax.vjp(mv, jnp.zeros((G.jmt, G.imt)))
        wT_A, = vjp(jnp.asarray(w, jnp.asarray(diff).dtype))
        resid = np.asarray(wT_A, np.float64) - w
        assert np.abs(resid).max() / area.max() < 5e-5


def test_berger_orbital_series():
    """Berger 1978 leading-term series (insolation.F orbit): modern
    epoch recovered, published paleo checkpoints within truncation
    tolerance, and the classic 6ka NH-summer insolation anomaly."""
    import numpy as np
    import jax.numpy as jnp
    from uvic_tpu.models.embm.insolation import (daily_insolation,
                                                 declination_eccf,
                                                 orbital_params)
    e0, o0, p0 = orbital_params(1950.0)
    assert abs(e0 - 0.016724) < 0.003
    assert abs(np.rad2deg(o0) - 23.446) < 0.05
    assert abs((np.rad2deg(p0) - 102.04 + 180) % 360 - 180) < 3.0

    e6, o6, p6 = orbital_params(1950.0 - 6000.0)
    assert abs(np.rad2deg(o6) - 24.105) < 0.1
    assert abs((np.rad2deg(p6) - 0.87 + 180) % 360 - 180) < 5.0

    e21, o21, p21 = orbital_params(1950.0 - 21000.0)
    assert abs(np.rad2deg(o21) - 22.949) < 0.1

    # 6ka: higher obliquity + perihelion near NH summer solstice ->
    # more NH high-latitude summer insolation (the Holocene optimum)
    lat = jnp.deg2rad(jnp.asarray([[65.0]]))
    q0 = float(daily_insolation(lat, 172.0, ecc=e0, obliq=o0,
                                per=p0)[0, 0])
    q6 = float(daily_insolation(lat, 172.0, ecc=e6, obliq=o6,
                                per=p6)[0, 0])
    assert q6 > q0 + 1.0e4   # > +10 W/m^2 anomaly (published: ~+25)
