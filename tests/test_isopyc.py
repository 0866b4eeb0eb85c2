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


# ---------------------------------------------------------------------------
# O_full_tensor (isopyc.F full-tensor blocks; non-default reference option)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ocean_full():
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=True, gent_mcwilliams=True, full_tensor=True,
        dtts=3600.0, dtuv=900.0, dtsf=900.0, tolrsf=1e8))
    return make_ocean(cfg)


def test_full_tensor_flat_isopycnals_match_small_angle(ocean_full,
                                                       ocean_iso):
    """With purely level isopycnals (no horizontal density gradient)
    the full tensor reduces exactly to the small-angle result: K11/K22
    collapse to the untapered Ai and K33/cross-terms vanish."""
    m_f, m_s = ocean_full, ocean_iso
    g = m_f.params.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m_f.params.topo.tmask)
    sf = m_f.init_state(t0)
    ss = m_s.init_state(t0)
    iso_f = compute_isopyc(sf.t, m_f.tmask, m_f.kmt, m_f.eos_c,
                           m_f.eos_to, m_f.eos_so, m_f.g,
                           m_f.cfg.ocean, True)
    iso_s = compute_isopyc(ss.t, m_s.tmask, m_s.kmt, m_s.eos_c,
                           m_s.eos_to, m_s.eos_so, m_s.g,
                           m_s.cfg.ocean, True)
    assert iso_f.full_tensor and not iso_s.full_tensor
    # equality holds where the vertical density gradient is non-zero on
    # all four face quadruples (at surface/bottom faces drodze = 0 and
    # the full tensor's projection drops the face contribution while
    # the small-angle form keeps it — reference behavior, isopyc.F:593
    # vs :627): compare strict interior levels of full-depth columns
    kmt = np.asarray(m_f.kmt)
    tm = np.asarray(m_f.tmask)
    km = tm.shape[0]
    interior = np.zeros_like(tm, dtype=bool)
    for k in range(1, km - 1):
        interior[k] = (kmt > k + 1)
    valid11 = interior & (np.roll(interior, -1, axis=2))
    valid22 = interior & (np.roll(interior, -1, axis=1))
    K11f, K11s = np.asarray(iso_f.K11), np.asarray(iso_s.K11)
    K22f, K22s = np.asarray(iso_f.K22), np.asarray(iso_s.K22)
    # rtol bounded below by EPSLN/drodze^2 contamination of the
    # projection denominator (up to ~1e-4 at depth where the stratification decays)
    np.testing.assert_allclose(K11f[valid11], K11s[valid11], rtol=1e-3)
    np.testing.assert_allclose(K22f[valid22], K22s[valid22], rtol=1e-3)
    assert float(jnp.abs(iso_f.K33).max()) < 1e-6


def test_full_tensor_fields_bounded(ocean_full):
    """Sloped isopycnals: the full tensor yields finite, non-negative
    K components (the Gerdes re-scaling replaces the slope clip)."""
    m = ocean_full
    state = _init(m)
    iso = compute_isopyc(state.t, m.tmask, m.kmt, m.eos_c, m.eos_to,
                         m.eos_so, m.g, m.cfg.ocean, True)
    for K in (iso.K11, iso.K22, iso.K33):
        assert not bool(jnp.isnan(K).any())
        assert float(K.min()) >= 0.0
    # projection factors keep K11/K22 <= Ai0
    assert float(iso.K11.max()) <= m.cfg.ocean.ahisop * 1.001
    assert float(iso.K22.max()) <= m.cfg.ocean.ahisop * 1.001


def test_full_tensor_spinup_stable_and_conserves(ocean_full):
    """The full-tensor flux divergence conserves total tracer under
    zero surface forcing and keeps the run finite."""
    m = ocean_full
    g = m.params.grid
    state = _init(m)
    dv = (np.asarray(g.dzt)[:, None, None]
          * np.asarray(g.cst)[None, :, None]
          * np.asarray(g.dyt)[None, :, None]
          * np.asarray(g.dxt)[None, None, :]) \
        * np.asarray(m.params.topo.tmask)
    dv = dv[:, 1:-1, 1:-1]

    def heat(s):
        return float((np.asarray(s.t[0])[:, 1:-1, 1:-1] * dv).sum())

    zero = jnp.zeros((2, g.jmt, g.imt))
    f = SurfaceForcing(smf=zero, stf=zero)
    h0 = heat(state)
    state = m.run(state, f, 20)
    assert not bool(jnp.isnan(state.t).any())
    assert abs(heat(state) - h0) / abs(h0) < 1e-9


def test_iso_weight_pack_matches_isoflux():
    """The weight-folded Redi/GM tendency (iso_weight_pack +
    iso_tendency — the perf path) is algebraically identical to the
    isoflux + divergence composition the model used before."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from uvic_tpu.config import small_config
    from uvic_tpu.models.ocean.model import make_ocean
    from uvic_tpu.models.ocean.isopyc import (compute_isopyc,
                                              iso_tendency,
                                              iso_weight_pack, isoflux)
    from uvic_tpu.ops.stencil import E, N, S, UP, W, setbcx

    cfg = small_config(imt=40, jmt=34, km=8)
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=True, gent_mcwilliams=True,
        aniso_zonal=True))
    m = make_ocean(cfg)
    g = m.g
    grid = m.params.grid
    rng = np.random.default_rng(21)
    lat = np.asarray(grid.yt)[:, None]
    t0 = np.zeros((3, grid.km, grid.jmt, grid.imt))
    t0[0] = ((16.0 * np.exp(-np.asarray(grid.zt) / 800e2))[:, None, None]
             * (0.5 + 0.5 * np.cos(np.deg2rad(lat)))[None])
    t0[1] = 2e-4 * rng.normal(size=t0[1].shape)
    t0[2] = rng.normal(size=t0[2].shape)      # a passive 3rd tracer
    t0 *= np.asarray(m.tmask)
    t = jnp.asarray(np.asarray(setbcx(jnp.asarray(t0), True)))

    iso = compute_isopyc(t[:2], m.tmask, m.kmt, m.eos_c, m.eos_to,
                         m.eos_so, g, cfg.ocean, True,
                         addisop=m.addisop)

    # old path: isoflux + the divergence exactly as model.py composed it
    fe_i, fn_i, fb_i = isoflux(iso, t, m.tmask, g, True)
    tmask = m.tmask
    old = ((fe_i * E(tmask)[None] - W(fe_i) * W(tmask)[None])
           * g.cstdxtr[None, None]
           + (fn_i * N(tmask)[None] - S(fn_i) * S(tmask)[None])
           * (1.0 / (g.cst * g.dyt))[None, None, :, None]
           + (UP(fb_i) - fb_i) * g.dztr[None, :, None, None])

    wp = iso_weight_pack(iso, g)
    new = iso_tendency(t, wp, m.tmask, g, True)

    scale = float(jnp.abs(old).max())
    assert scale > 0.0
    np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                               rtol=1e-8, atol=1e-10 * scale)
