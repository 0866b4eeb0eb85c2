"""Tests: time-interpolated forcing, restoring BCs, shortwave
penetration, and config consistency checking."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import BgcConfig, ModelConfig, small_config
from uvic_tpu.checks import ConfigError, validate
from uvic_tpu.io.timeforce import TimeInterpField, restoring_flux


def test_timeinterp_linear_and_periodic():
    """Linear between record centers; periodic across the year end
    (timeinterp.F method 1)."""
    nrec, ny, nx = 12, 3, 4
    vals = np.arange(nrec, dtype=float)[:, None, None] \
        * np.ones((1, ny, nx))
    f = TimeInterpField(vals)
    # exactly at a record center -> that record
    c3 = (3 + 0.5) / 12
    np.testing.assert_allclose(np.asarray(f(c3)), 3.0, atol=1e-12)
    # halfway between centers 3 and 4 -> mean
    mid = (c3 + (4 + 0.5) / 12) / 2
    np.testing.assert_allclose(np.asarray(f(mid)), 3.5, atol=1e-12)
    # periodic wrap: halfway between center 11 and center 0 (+1 yr)
    tw = ((11 + 0.5) / 12 + 1.0 / 24 / 2 + 1.0 / 48)
    got = float(np.asarray(f(tw))[0, 0])
    assert 5.4 < got < 11.5 or got < 0.1 + 11  # within record range
    # year offset invariance
    np.testing.assert_allclose(np.asarray(f(mid + 7.0)),
                               np.asarray(f(mid)), atol=1e-12)


def test_timeinterp_scale_offset():
    f = TimeInterpField(np.ones((4, 2, 2)) * 10.0, scale=0.001,
                        offset=-0.035)
    np.testing.assert_allclose(np.asarray(f(0.3)), -0.025, atol=1e-12)


def test_restoring_flux_sign_and_rate():
    """stf = dampdz/(dampts*daylen)*(data - model) (data.F:130-135)."""
    got = restoring_flux(jnp.asarray(12.0), jnp.asarray(10.0),
                         30.0, 50.0e2)
    expect = 50.0e2 / (30.0 * 86400.0) * 2.0
    np.testing.assert_allclose(float(got), expect, rtol=1e-12)


def test_ocean_restoring_pulls_sst():
    """Uncoupled ocean with O_restorst warms toward a warmer SST
    climatology at the Newtonian rate."""
    from uvic_tpu.models.ocean.model import make_forcing, make_ocean
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        restorst=True, dtts=43200.0, dtuv=1800.0, dtsf=1800.0,
        tolrsf=1e8))
    m = make_ocean(cfg)
    g = m.params.grid
    t0 = np.full((2, g.km, g.jmt, g.imt), 0.0)
    t0[0] = 10.0
    t0 *= np.asarray(m.params.topo.tmask)
    state = m.init_state(t0)
    sst_clim = TimeInterpField(
        np.full((12, g.jmt, g.imt), 14.0))
    base = make_forcing(jnp.zeros((2, g.jmt, g.imt)),
                        jnp.zeros((m.nt, g.jmt, g.imt)))
    f = m.apply_restoring(base, state, sst_clim, None)
    sst_before = float(np.asarray(state.t[0, 0]).max())
    state = m.step(state, f, leapfrog=False)
    for _ in range(5):
        f = m.apply_restoring(f, state, sst_clim, None)
        state = m.step(state, f, leapfrog=True)
    wet = np.asarray(m.params.topo.tmask)[0] > 0
    sst_after = np.asarray(state.t[0, 0])[wet].mean()
    assert sst_after > sst_before + 1e-4   # warming toward 14 C
    assert sst_after < 14.0                # but not past the data


def test_shortwave_penetration_redistributes_heat():
    """O_shortwave: column-integrated temperature source ~ 0 minus the
    part penetrating below the bottom; level 1 loses, deeper levels
    gain (swflux0 semantics)."""
    from uvic_tpu.models.ocean.model import make_forcing, make_ocean
    cfg = small_config()
    base = dataclasses.replace(cfg.ocean, isopycmix=False,
                               gent_mcwilliams=False, dtts=43200.0,
                               dtuv=1800.0, dtsf=1800.0, tolrsf=1e8)
    m_on = make_ocean(cfg.replace(ocean=dataclasses.replace(
        base, shortwave=True)))
    m_off = make_ocean(cfg.replace(ocean=base))
    g = m_on.params.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    # stably stratified so convection does not rehomogenize the
    # (small) shortwave redistribution back out
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m_on.params.topo.tmask)
    f = make_forcing(jnp.zeros((2, g.jmt, g.imt)),
                     jnp.zeros((m_on.nt, g.jmt, g.imt)),
                     swr=jnp.full((g.jmt, g.imt), 2.0e5))
    s_on = m_on.step(m_on.init_state(t0), f, leapfrog=False)
    s_off = m_off.step(m_off.init_state(t0), f, leapfrog=False)
    dT = np.asarray(s_on.t[0] - s_off.t[0])
    wet = np.asarray(m_on.params.topo.tmask) > 0
    # surface level cools relative to no-penetration (flux exported
    # downward), subsurface warms
    assert dT[0][wet[0]].mean() < 0
    assert dT[1][wet[1]].mean() > 0
    # column heat approximately conserved up to light lost through the
    # bottom of the deepest level
    dz = np.asarray(g.dzt)[:, None, None]
    col = (dT * dz * wet).sum(0)
    srf = np.abs(dT[0][wet[0]]).mean() * float(dz[0, 0, 0])
    assert np.abs(col[wet[0]]).mean() < 0.6 * srf


def test_validate_accepts_defaults():
    warnings = validate(ModelConfig())
    assert isinstance(warnings, list)


def test_validate_rejects_bad_timesteps():
    cfg = ModelConfig()
    cfg = cfg.replace(ocean=dataclasses.replace(cfg.ocean, dtts=-1.0))
    with pytest.raises(ConfigError, match="dtts"):
        validate(cfg)


def test_validate_rejects_inconsistent_bgc():
    cfg = ModelConfig().replace(bgc=BgcConfig(
        suite="mobi", nitrogen=True, o2=False))
    with pytest.raises(ConfigError, match="O_mobi_o2"):
        validate(cfg)
    cfg = ModelConfig().replace(bgc=BgcConfig(
        suite="mobi", carbon=False, caco3=True))
    with pytest.raises(ConfigError, match="carbon"):
        validate(cfg)


def test_validate_rejects_nondivisible_segment():
    cfg = ModelConfig()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, dtts=100000.0))   # 5 days = 432000 s not divisible
    with pytest.raises(ConfigError, match="segment"):
        validate(cfg)


def test_validate_restoring_requires_positive_damping():
    cfg = ModelConfig()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, restorst=True, dampts=(0.0, 30.0)))
    with pytest.raises(ConfigError, match="dampts"):
        validate(cfg)


def test_run_restoring_pulls_toward_climatology():
    """Ocean-only restoring production driver (O_restorst,
    data.F:119-142): SST moves toward the seasonal climatology."""
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from uvic_tpu.config import small_config
    from uvic_tpu.io.timeforce import default_surface_climatology
    from uvic_tpu.models.ocean.model import make_ocean

    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8,
        dampts=(10.0, 10.0)))     # strong restoring for the test
    m = make_ocean(cfg)
    g = m.params.grid
    # start 5 K off the climatology everywhere
    sstf, sssf = default_surface_climatology(g)
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    t0[0] = 10.0
    t0 *= np.asarray(m.params.topo.tmask)
    state = m.init_state(t0)
    smf = jnp.zeros((2, g.jmt, g.imt), m.cfg.np_dtype)

    clim0 = np.asarray(sstf(0.04))
    wet = np.asarray(m.tmask[0]) > 0
    err_before = np.abs(np.asarray(state.t[0, 0]) - clim0)[wet].mean()
    state = m.run_restoring(state, smf, sstf, sssf, nseg=1,
                            seg_days=30.0)
    err_after = np.abs(np.asarray(state.t[0, 0]) - clim0)[wet].mean()
    assert err_after < 0.7 * err_before, (err_before, err_after)
    assert not bool(jnp.isnan(state.t).any())


def test_checks_new_rules():
    """Round-4 checks.F breadth: scheme variants, ice, cadence
    rounding, tidal_kv inertness, parallel halo law."""
    import dataclasses
    import pytest
    from uvic_tpu.checks import ConfigError, validate
    from uvic_tpu.config import ModelConfig

    cfg = ModelConfig()

    def o(**kw):
        return cfg.replace(ocean=dataclasses.replace(cfg.ocean, **kw))

    with pytest.raises(ConfigError, match="fct_variant"):
        validate(o(fct_variant="bogus"))
    with pytest.raises(ConfigError, match="O_fct_3d"):
        validate(o(tracer_advection="centered", fct_3d=True))
    with pytest.raises(ConfigError, match="sf_npt"):
        validate(o(sf_npt=7))
    with pytest.raises(ConfigError, match="aidif"):
        validate(o(aidif=1.5))
    with pytest.raises(ConfigError, match="dtxcel"):
        validate(o(dtxcel_deep=0.5))
    with pytest.raises(ConfigError, match="cpts"):
        validate(cfg.replace(ice=dataclasses.replace(cfg.ice, cpts=4)))

    # tidal_kv without isopycmix is fatal (checks.F:303-306; was a
    # round-4 INERT warning, upgraded to the reference's error)
    with pytest.raises(ConfigError, match="tidal_kv"):
        validate(o(tidal_kv=True, isopycmix=False,
                   gent_mcwilliams=False))
    # accel warning
    w = validate(o(dtxcel_deep=3.0))
    assert any("distorts transients" in s for s in w)
    # segtim/dtatm divisibility is fatal (ntspas rounding drift)
    with pytest.raises(ConfigError, match="dtatm"):
        validate(cfg.replace(embm=dataclasses.replace(
            cfg.embm, dtatm=50000.0)))
    # cadence rounding warning
    w = validate(cfg.replace(time=dataclasses.replace(
        cfg.time, tsiint=7.0)))
    assert any("tsiint" in s for s in w)

    # parallel halo law: a y-split too fine for the stencil halo fails
    with pytest.raises(ConfigError, match="halo"):
        validate(cfg.replace(parallel=dataclasses.replace(
            cfg.parallel, mesh_shape=(16, 1))))
    # a sane mesh passes
    validate(cfg.replace(parallel=dataclasses.replace(
        cfg.parallel, mesh_shape=(2, 2))))


def test_checks_round5_rules():
    """Round-5 checks.F breadth: scheme-conflict errors upgraded to the
    reference's fatality, grid geometry, acceleration-vs-seasonal,
    sediment coupling, bgc substep divisibility."""
    import dataclasses
    import pytest
    from uvic_tpu.checks import ConfigError, validate
    from uvic_tpu.config import ModelConfig, SedConfig

    cfg = ModelConfig()

    def o(**kw):
        return cfg.replace(ocean=dataclasses.replace(cfg.ocean, **kw))

    # scheme conflicts (checks.F:296-312, 398-403)
    with pytest.raises(ConfigError, match="biharmonic"):
        validate(o(hmix="biharmonic"))
    with pytest.raises(ConfigError, match="gent_mcwilliams"):
        validate(o(isopycmix=False, gent_mcwilliams=True,
                   tidal_kv=False))
    with pytest.raises(ConfigError, match="too large"):
        validate(o(ahisop=2.0e11))

    # grid geometry (grids.F / size_check.F analog)
    with pytest.raises(ConfigError, match="360 degrees"):
        validate(cfg.replace(grid=dataclasses.replace(
            cfg.grid, x_bounds=(0.0, 350.0))))

    # acceleration + seasonal forcing (accel.h / Bryan 1984)
    w = validate(cfg.replace(
        ocean=dataclasses.replace(cfg.ocean, dtxcel_deep=3.0),
        embm=dataclasses.replace(cfg.embm, seasonal=True)))
    assert any("seasonal" in s for s in w)

    # sediments need the carbon system (sed.F)
    with pytest.raises(ConfigError, match="carbon system"):
        validate(cfg.replace(sed=SedConfig(enabled=True)))

    # ppmix + explicit vertical diffusion warns (vmixc.F aidif)
    w = validate(o(vmix="ppmix", aidif=0.0))
    assert any("ppmix" in s for s in w)

    # runlen rounding (UVic_ESCM.F:655-663)
    w = validate(cfg.replace(time=dataclasses.replace(
        cfg.time, runlen_days=12.5)))
    assert any("runlen" in s for s in w)

    # float64 platform guidance
    w = validate(cfg.replace(dtype="float64"))
    assert any("float64" in s for s in w)
