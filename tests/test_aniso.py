"""Tests: anisotropic viscosity (Large 2001) and equatorial zonal
isopycnal mixing (Getzlaff & Dietze 2013)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from uvic_tpu.config import small_config
from uvic_tpu.models.ocean.aniso import (equatorial_zonal_diffusivity,
                                         large_anisotropic_viscosity,
                                         wbc_distance)
from uvic_tpu.models.ocean.model import make_forcing, make_ocean


def test_wbc_distance():
    m = np.ones((3, 8))
    m[:, 2] = 0          # meridional wall at i=2
    d = wbc_distance(m, cyclic=True)
    assert d[0, 3] == 1 and d[0, 4] == 2 and d[0, 5] == 3
    # far from any boundary -> capped at 11
    m2 = np.ones((2, 30))
    assert (wbc_distance(m2) == 11).all()


def test_aniso_viscosity_structure():
    yu = np.linspace(-85.0, 85.0, 35)
    dxu = np.full(40, 5.0 * 1.11e7)      # 5 deg in cm
    dyu = np.full(35, 5.0 * 1.11e7)
    umask = np.ones((35, 40))
    umask[:, 0] = 0                      # a western wall
    zw = np.array([2.5e4, 5.4e4, 1.0e5, 2.0e5])
    am = 1.5e9
    vce, vcn = large_anisotropic_viscosity(yu, dxu, dyu, umask, zw, am)
    eq = np.argmin(np.abs(yu))
    # tropics + upper ocean: zonal viscosity is the grid velocity
    # scale 0.5*V0*gridlen (hmixc.F:135)
    glen = max(5.0 * 1.11e7 * abs(np.cos(np.deg2rad(yu[eq]))),
               5.0 * 1.11e7)
    np.testing.assert_allclose(vce[0, eq, 20], 0.5 * 100.0 * glen,
                               rtol=1e-6)
    # below 550 m and poleward of 20 deg -> constant am
    assert (vce[2] == am).all() and (vcn[2] == am).all()
    assert (vce[0, 0] == am).all()
    # near the western boundary the Munk scale dominates the eddy
    # scale at the equator
    assert vcn[0, eq, 1] > vcn[0, eq, 25]


def test_equatorial_zonal_diffusivity_taper():
    yt = np.array([-12.0, -10.0, -7.5, -4.0, 0.0, 4.0, 7.5, 10.0, 12.0])
    a = equatorial_zonal_diffusivity(yt, amp=1.0)
    np.testing.assert_allclose(a, [0, 0, 0.5, 1, 1, 1, 0.5, 0, 0],
                               atol=1e-12)


def test_aniso_step_runs():
    cfg = small_config()
    m = make_ocean(cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=True, gent_mcwilliams=True,
        aniso_visc=True, aniso_zonal=True, dtts=3600.0, dtuv=900.0,
        dtsf=900.0, tolrsf=1e8)))
    g = m.params.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m.params.topo.tmask)
    yu = np.asarray(g.yu)
    taux = np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    smf = np.stack([taux / 1.035, np.zeros_like(taux)])
    f = make_forcing(jnp.asarray(smf),
                     jnp.zeros((m.nt, g.jmt, g.imt)))
    s = m.step(m.init_state(t0), f, leapfrog=False)
    for _ in range(4):
        s = m.step(s, f, leapfrog=True)
    assert not bool(jnp.isnan(s.t).any())
    assert not bool(jnp.isnan(s.u).any())
