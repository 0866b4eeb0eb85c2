"""Coarse real-Earth geography (core/earth.py, topog.F data analog)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import ModelConfig, small_config
from uvic_tpu.core.earth import earth_elevation, earth_kmt, land_mask
from uvic_tpu.core.grid import make_grid


@pytest.fixture(scope="module")
def grid():
    return make_grid(ModelConfig().grid)


@pytest.fixture(scope="module")
def kmt(grid):
    return earth_kmt(grid)


def _cell(grid, lon, lat):
    i = int(np.argmin(np.abs((np.asarray(grid.xt) % 360.0) - lon)))
    j = int(np.argmin(np.abs(np.asarray(grid.yt) - lat)))
    return j, i


def test_earth_basins(grid, kmt):
    """First-order geography: basin cells ocean, continent cells land."""
    ocean_points = [
        (330.0, 30.0),   # North Atlantic
        (335.0, -20.0),  # South Atlantic
        (200.0, 30.0),   # North Pacific
        (220.0, -20.0),  # South Pacific
        (80.0, -10.0),   # Indian
        (0.0, 85.0),     # Arctic
        (295.0, -58.0),  # Drake Passage
        (0.0, -55.0),    # circumpolar channel
        (15.0, 37.0),    # Mediterranean
    ]
    land_points = [
        (20.0, 10.0),    # Africa
        (90.0, 55.0),    # Siberia
        (78.0, 22.0),    # India
        (255.0, 40.0),   # North America
        (300.0, -10.0),  # South America (Amazon)
        (135.0, -25.0),  # Australia
        (320.0, 75.0),   # Greenland
        (90.0, -80.0),   # Antarctica
    ]
    for lon, lat in ocean_points:
        j, i = _cell(grid, lon, lat)
        assert kmt[j, i] > 0, f"expected ocean at ({lon}, {lat})"
    for lon, lat in land_points:
        j, i = _cell(grid, lon, lat)
        assert kmt[j, i] == 0, f"expected land at ({lon}, {lat})"
    frac = (kmt > 0)[1:-1, 1:-1].mean()
    assert 0.55 < frac < 0.75, frac


def test_earth_connectivity(grid, kmt):
    """One connected world ocean (repair fills isolated seas; the
    carved Gibraltar keeps the Mediterranean attached)."""
    from scipy import ndimage
    ocean = kmt[:, 1:-1] > 0
    lab, n = ndimage.label(ocean)
    for j in range(lab.shape[0]):
        a, b = lab[j, 0], lab[j, -1]
        if a > 0 and b > 0 and a != b:
            lab[lab == b] = a
    assert len(np.unique(lab[lab > 0])) == 1


def test_earth_elevation(grid):
    elev = earth_elevation(grid)
    j, i = _cell(grid, 88.0, 33.0)    # Tibet
    assert elev[j, i] > 3.0e5         # > 3000 m (cm units)
    j, i = _cell(grid, 220.0, -20.0)  # open ocean
    assert elev[j, i] == 0.0


def test_earth_coupled_segment_runs():
    """The coupled model runs a segment on the real-Earth geometry."""
    from uvic_tpu.coupler.driver import CoupledModel
    cfg = ModelConfig()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False, tolrsf=1e8))
    m = CoupledModel(cfg, topo_kind="earth")
    state = m.init_state()
    state = m.run_segment(state)
    assert not bool(jnp.isnan(state.ocean.t).any())
    assert not bool(jnp.isnan(state.atm.at).any())


def test_landice_fields_footprint_and_application():
    """icedata.F analog: the LGM footprint binarizes at >=0.5 extent
    scale (icedata.F interpolation), covers the Laurentide/Fennoscandian
    sectors at full scale, and feeds the EMBM as an ice-sheet coalbedo
    + elevation anomaly."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from uvic_tpu.config import small_config
    from uvic_tpu.core.earth import landice_fields
    from uvic_tpu.coupler.driver import CoupledModel

    cfg = small_config().replace(dtype="float64")
    m = CoupledModel(cfg, topo_kind="earth")
    g = m.grid
    a0, h0 = landice_fields(g, 0.4)     # below the 0.5 binarization
    assert float(np.abs(a0).max()) == 0.0
    a1, h1 = landice_fields(g, 1.0)
    lat = np.asarray(g.yt)[:, None]
    lon = np.asarray(g.xt)[None, :] % 360.0
    laurentide = (lat > 50) & (lat < 70) & (lon > 230) & (lon < 290)
    assert a1[np.broadcast_to(laurentide, a1.shape)].max() == 1.0
    assert (h1[a1 > 0.5] > 0).all()
    # application: ice-covered land absorbs less shortwave
    st = m.init_state()
    fl_mod = m.embm.fluxes(st.atm, st.ocean.t[0, 0])
    fl_lgm = m.embm.fluxes(st.atm, st.ocean.t[0, 0],
                           hicel=jnp.asarray(h1), aicel=jnp.asarray(a1))
    dn_mod = np.asarray(fl_mod["dnswr"])
    dn_lgm = np.asarray(fl_lgm["dnswr"])
    ice_cells = (a1 > 0.5) & (np.asarray(m.embm.lmsk) > 0.5)
    assert ice_cells.any()
    assert (dn_lgm[ice_cells] < dn_mod[ice_cells] - 1.0).all()
