"""Grid construction invariants (reference: grids.F consistency checks)."""

import numpy as np

from uvic_tpu.config import GridConfig, small_config
from uvic_tpu.core.grid import gcell, make_grid


def test_gcell_uniform():
    dt, du = gcell((0.0, 360.0), (3.6, 3.6), nbpts=1)
    assert len(dt) == 102 and len(du) == 102
    np.testing.assert_allclose(dt, 3.6)
    np.testing.assert_allclose(du, 3.6)


def test_gcell_t_is_average_of_u():
    # stretched vertical: the "t is average of u" law (grids.F:117-149)
    dt, du = gcell((0.0, 6000.0), (50.0, 582.0), nbpts=0)
    dubar = 0.5 * (du[1:] + du[:-1])
    np.testing.assert_allclose(dt[1:], dubar, rtol=1e-12)
    assert abs(np.sum(du) - (6000.0 - 0.5 * 50 + 0.5 * 582)) < 600.0


def test_std_grid_coordinates():
    g = make_grid(GridConfig())
    assert (g.imt, g.jmt, g.km) == (102, 102, 19)
    # western edge of 2nd t cell at lon 0, southern edge of 2nd at -90
    assert abs(g.xu[0] - 0.0) < 1e-9
    assert abs(g.yu[0] - (-90.0)) < 1e-9
    np.testing.assert_allclose(g.xt[1], 1.8, atol=1e-9)
    np.testing.assert_allclose(np.diff(g.xt), 3.6, atol=1e-9)
    np.testing.assert_allclose(np.diff(g.yt), 1.8, atol=1e-9)
    # top model level ~50 m thick; T point centered in it
    assert 45.0e2 < g.dzt[0] < 60.0e2
    np.testing.assert_allclose(g.zt[0], 0.5 * g.dzt[0], rtol=1e-12)
    # total depth near 6000 m
    assert 5000.0e2 < g.zw[-1] < 6500.0e2
    # dzw consistency: dzw[0]=zt[0], dzw[k]=zt[k+1]-zt[k]
    np.testing.assert_allclose(g.dzw[0], g.zt[0])
    np.testing.assert_allclose(g.dzw[1:-1], np.diff(g.zt))


def test_metric_factors():
    g = make_grid(small_config().grid)
    np.testing.assert_allclose(g.cst, np.cos(np.deg2rad(g.yt)), atol=1e-12)
    np.testing.assert_allclose(g.dxtr * g.dxt, 1.0)
    np.testing.assert_allclose(g.cstdyt2r, 0.5 / (g.cst * g.dyt))
    np.testing.assert_allclose(g.dztur, 1.0 / (g.dzw[:-1] * g.dzt))
    # cyclic width duplication (grids.F:449-454)
    assert g.dxt[0] == g.dxt[-2] and g.dxt[-1] == g.dxt[1]
