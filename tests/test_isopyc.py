"""Isopycnal/GM mixing tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.models.ocean.isopyc import compute_isopyc
from uvic_tpu.models.ocean.model import SurfaceForcing, make_ocean


@pytest.fixture(scope="module")
def ocean_iso():
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=True, gent_mcwilliams=True,
        dtts=3600.0, dtuv=900.0, dtsf=900.0, tolrsf=1e8))
    return make_ocean(cfg)


def _init(m):
    g = m.params.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    yy = np.asarray(g.yt)
    t0[0] = ((20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
             * (1.0 - 0.5 * np.abs(yy / 90.0))[None, :, None])
    t0 *= np.asarray(m.params.topo.tmask)
    return m.init_state(t0)


def test_iso_fields_shapes_and_signs(ocean_iso):
    m = ocean_iso
    state = _init(m)
    iso = compute_isopyc(state.t, m.tmask, m.kmt, m.eos_c, m.eos_to,
                         m.eos_so, m.g, m.cfg.ocean, True)
    # K11/K22/K33 are diffusivities: non-negative, bounded by ahisop-ish
    for K in (iso.K11, iso.K22, iso.K33):
        assert float(K.min()) >= 0.0
        assert not bool(jnp.isnan(K).any())
    assert float(iso.K11.max()) <= m.cfg.ocean.ahisop * 1.001
    # GM velocities are bounded and masked on land
    land = np.asarray(m.params.topo.tmask) == 0
    assert np.abs(np.asarray(iso.vetiso)[land]).max() == 0.0


def test_iso_gm_divergence_free(ocean_iso):
    """The GM bolus velocity field satisfies discrete continuity by
    construction (isopyc.F:1268-1290): the vertical velocity at the
    ocean bottom, integrated from the surface, vanishes there."""
    m = ocean_iso
    state = _init(m)
    iso = compute_isopyc(state.t, m.tmask, m.kmt, m.eos_c, m.eos_to,
                         m.eos_so, m.g, m.cfg.ocean, True)
    kmt = np.asarray(m.kmt)
    vbt = np.asarray(iso.vbtiso)
    jj, ii = np.where(kmt > 0)
    bot = vbt[kmt[jj, ii] - 1, jj, ii]
    assert np.abs(bot).max() == 0.0   # explicitly zeroed at kmt


def test_iso_spinup_stable_and_conserves(ocean_iso):
    m = ocean_iso
    g = m.params.grid
    state = _init(m)
    dv = (np.asarray(g.dzt)[:, None, None]
          * np.asarray(g.cst)[None, :, None] * np.asarray(g.dyt)[None, :, None]
          * np.asarray(g.dxt)[None, None, :]) * np.asarray(m.params.topo.tmask)
    dv = dv[:, 1:-1, 1:-1]

    def heat(s):
        return float((np.asarray(s.t[0])[:, 1:-1, 1:-1] * dv).sum())

    zero = jnp.zeros((2, g.jmt, g.imt))
    f = SurfaceForcing(smf=zero, stf=zero)
    h0 = heat(state)
    state = m.run(state, f, 20)
    assert not bool(jnp.isnan(state.t).any())
    assert abs(heat(state) - h0) / abs(h0) < 1e-9
