"""Topography, masks, and island labeling."""

import numpy as np

from uvic_tpu.config import small_config
from uvic_tpu.core.grid import make_grid
from uvic_tpu.core.topog import idealized_kmt, make_topography


def _topo(kind="world"):
    g = make_grid(small_config().grid)
    kmt = idealized_kmt(g, kind)
    return g, make_topography(g, kmt)


def test_kmu_min_rule():
    g, topo = _topo()
    kmt = topo.kmt
    expect = np.minimum.reduce([
        kmt[:-1, :-1], kmt[:-1, 1:], kmt[1:, :-1], kmt[1:, 1:]])
    np.testing.assert_array_equal(topo.kmu[:-1, :-1], expect)


def test_masks_consistent():
    g, topo = _topo()
    assert topo.tmask.shape == (g.km, g.jmt, g.imt)
    np.testing.assert_array_equal(topo.tmask.sum(0), topo.kmt)
    np.testing.assert_array_equal(topo.umask.sum(0), topo.kmu)
    # hr is reciprocal depth on ocean U cells, zero on land
    ocean_u = topo.kmu > 0
    np.testing.assert_allclose(topo.hr[ocean_u] * topo.h[ocean_u], 1.0)
    assert (topo.hr[~ocean_u] == 0).all()


def test_island_labeling():
    g, topo = _topo("world")
    # expect >= 2 land masses (south polar + north-attached continents + island)
    assert topo.nisle >= 3
    # every perimeter cell is ocean and adjacent to its land mass
    pid = topo.perim_id
    assert ((pid >= 0) <= (topo.kmt > 0)).all()
    assert (topo.perim_count > 0).all()
    # main landmass is the biggest one
    sizes = np.bincount(topo.land_map[topo.land_map > 0])
    assert sizes[topo.imain + 1] == sizes[1:].max()


def test_box_geometry():
    g, topo = _topo("box")
    assert topo.nisle == 1  # a single enclosing land frame
    assert topo.kmt[1:-1, 1:-1].max() == g.km


def test_set_kmt_region_and_bcest():
    """setkmp.F parallelogram edit + bcest.F zonal climatology
    estimates (round-5: the last small SURVEY 2.3 row)."""
    import numpy as np
    from uvic_tpu.config import small_config
    from uvic_tpu.core.grid import make_grid
    from uvic_tpu.core.topog import idealized_kmt, set_kmt_region
    from uvic_tpu.io.bcest import bcest, bcest_fields

    grid = make_grid(small_config().grid)
    kmt = idealized_kmt(grid, "world")
    out = set_kmt_region(kmt, grid, -10.0, 40.0, 80.0,
                         10.0, 50.0, 90.0, 0)
    assert (out != kmt).any()
    j = int(np.argmin(np.abs(np.asarray(grid.yt))))
    assert out[j, np.argmin(np.abs(np.asarray(grid.xt) - 60.0))] == 0
    # untouched far away
    assert (out[0] == kmt[0]).all()

    wsx, wsy, sst, sss = bcest(np.array([0.0, -45.0, 45.0, 80.0]),
                               np.array([0.0, -49.0, 44.0, 80.0]))
    assert 25.0 < sst[0] < 29.0          # Levitus-like equator
    assert sst[3] < 3.0                  # cold Arctic
    assert wsx[0] < 0.0                  # easterly trades
    assert wsx[1] > 0.8 and wsx[2] > 0.6  # westerly maxima
    assert 33.0 < sss[3] < 34.6          # fresh high lat
    f = bcest_fields(grid)
    for k in ("wsx", "wsy", "sst", "sss"):
        assert f[k].shape == (grid.jmt, grid.imt)
        assert np.isfinite(f[k]).all()
