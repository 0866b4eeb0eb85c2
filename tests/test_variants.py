"""Scheme-variant tests: QUICKER advection, Euler-backward mixing,
9-point barotropic operator, ppmix, MOBI suite, scan driver, forcing."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import mobi_full, small_config
from uvic_tpu.models.ocean.model import make_forcing, make_ocean


def _setup(**ocean_kw):
    cfg = small_config()
    base = dict(isopycmix=False, gent_mcwilliams=False, dtts=3600.0,
                dtuv=900.0, dtsf=900.0, tolrsf=1e8)
    base.update(ocean_kw)
    cfg = cfg.replace(ocean=dataclasses.replace(cfg.ocean, **base))
    m = make_ocean(cfg)
    g = m.params.grid
    t0 = np.zeros((2, g.km, g.jmt, g.imt))
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m.params.topo.tmask)
    yu = np.asarray(g.yu)
    taux = np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    f = make_forcing(jnp.asarray(np.stack([taux / 1.035,
                                           np.zeros_like(taux)])),
                     jnp.zeros((m.nt, g.jmt, g.imt)))
    return m, m.init_state(t0), f


@pytest.mark.parametrize("scheme", ["quicker", "centered", "upstream"])
def test_advection_variants_stable(scheme):
    m, s, f = _setup(tracer_advection=scheme)
    s = m.run(s, f, 20)
    assert not bool(jnp.isnan(s.t).any())
    assert float(jnp.abs(s.t[0]).max()) < 50.0


def test_euler_backward_mixing():
    m, s, f = _setup(eb=True)
    s = m.run(s, f, 20)   # includes EB mixing steps at itt%16==0
    assert not bool(jnp.isnan(s.t).any())
    assert int(s.itt) == 20


def test_sfc9pt_operator():
    """Stable since the active-constant CG deflation (ops/solvers.py):
    the 9-pt instability was secular null-mode drift, not the
    checkerboard (which was already deflated)."""
    m, s, f = _setup(sf_npt=9)
    s = m.run(s, f, 15)
    assert not bool(jnp.isnan(s.psi0).any())
    assert 1e10 < float(jnp.abs(s.psi0).max()) < 1e14


@pytest.mark.parametrize("scheme,kw", [
    ("smagnl", {}),
    ("biharmonic", {"ambi": 1.0e21, "ahbi": 5.0e20}),
])
def test_hmix_variants_stable(scheme, kw):
    m, s, f = _setup(hmix=scheme, **kw)
    s = m.run(s, f, 20)
    assert not bool(jnp.isnan(s.t).any())
    assert float(jnp.abs(s.t[0]).max()) < 50.0
    assert float(jnp.abs(s.u).max()) < 500.0


def test_ppmix_scheme():
    m, s, f = _setup(vmix="ppmix", aidif=0.0)
    s = m.run(s, f, 10)
    assert not bool(jnp.isnan(s.t).any())


def test_scan_driver_consistency():
    m, s, f = _setup()
    s_scan = m.run_scan(s, f, 16)
    # scan is self-consistent across boundaries (bitwise)
    m2, s2, f2 = _setup()
    s_split = m2.run_scan(m2.run_scan(s2, f2, 7), f2, 9)
    np.testing.assert_array_equal(np.asarray(s_scan.t),
                                  np.asarray(s_split.t))


def test_mobi_suite_runs():
    cfg = small_config()
    cfg = cfg.replace(
        ocean=dataclasses.replace(cfg.ocean, isopycmix=False,
                                  gent_mcwilliams=False, dtts=3600.0,
                                  dtuv=900.0, dtsf=900.0, tolrsf=1e8),
        bgc=mobi_full())
    m = make_ocean(cfg)
    assert m.nt >= 35
    for name in ("dic13", "diat", "sil", "dfe", "din15", "pa231"):
        assert name in m.tracer_index
    s = m.init_state()
    g = m.params.grid
    f = make_forcing(jnp.zeros((2, g.jmt, g.imt)),
                     jnp.zeros((m.nt, g.jmt, g.imt)))
    s = m.run(s, f, 5)
    assert not bool(jnp.isnan(s.t).any())


def test_cfc_fluxes():
    import jax.numpy as jnp
    from uvic_tpu.config import BgcConfig
    from uvic_tpu.coupler.tracers import TracerIndex, build_registry
    from uvic_tpu.io.forcing import cfc_series
    from uvic_tpu.models.bgc.gasx import (cfc_saturation,
                                          hemispheric_blend,
                                          surface_gas_fluxes)

    idx = TracerIndex(build_registry(BgcConfig(cfc=True)))
    assert "cfc11" in idx and "cfc12" in idx

    # Warner & Weiss solubility sanity: ~0.0063 mol/l/atm at 10C, 35 psu
    sat = cfc_saturation(jnp.asarray(10.0), jnp.asarray(35.0),
                         260.0, 11)     # mol/m^3 at 260 pptv
    assert 1e-9 < float(sat) < 5e-9

    # atmospheric history rises to the early-90s plateau then declines
    s11 = cfc_series(11, "n")
    assert s11.at(1950.0) < 5.0
    assert 250.0 < s11.at(1993.0) < 275.0
    assert s11.at(2008.0) < s11.at(1994.0)

    jmt, imt = 8, 10
    sst = jnp.full((jmt, imt), 15.0)
    sss = jnp.full((jmt, imt), 35.0)
    wspd = jnp.full((jmt, imt), 800.0)   # cm/s
    ao = jnp.ones((jmt, imt))
    lat = jnp.broadcast_to(jnp.linspace(-80, 80, jmt)[:, None],
                           (jmt, imt))
    surf = jnp.zeros((idx.nt, jmt, imt))
    cfc_atm = (hemispheric_blend(lat, 270.0, 250.0),
               hemispheric_blend(lat, 540.0, 520.0))
    flux, _ = surface_gas_fluxes(sst, sss, wspd, ao, surf, idx,
                                 cfc_atm=cfc_atm)
    f11 = flux[idx["cfc11"]]
    assert float(f11.min()) > 0.0        # invasion into a cfc-free ocean
    # northern boxes see higher atmospheric loading
    assert float(f11[-1, 0]) > float(f11[0, 0])


def test_transient_forcing():
    from uvic_tpu.io.forcing import TransientForcing, co2_series
    tf = TransientForcing.default()
    f1850 = tf.at(1850.0)
    f2000 = tf.at(2000.0)
    assert 280 < f2000["co2ccn"] < 380
    assert f2000["co2ccn"] > f1850["co2ccn"]
    assert co2_series().at(1000.0) == pytest.approx(280.0)


# ---------------------------------------------------------------------------
# surface-pressure barotropic modes (bardiv.F / spforc / spc9pt)
# ---------------------------------------------------------------------------

def _sp_divergence(m, s):
    """max |div(H ubar)| over interior T cells (the constraint the
    rigid-lid elliptic solve enforces, bardiv.F:146-178)."""
    from uvic_tpu.models.ocean.surfpress import spforc
    g = m.g
    d = spforc(s.ubar, g.dxu, g.dyu, g.csu, g.h)
    return float(jnp.abs(d[1:-1, 1:-1]).max())


@pytest.mark.parametrize("mode", ["surface_pressure",
                                  "implicit_free_surface"])
def test_surface_pressure_modes_stable(mode):
    m, s, f = _setup(barotropic=mode, mxscan=300,
                     tolrsp=1e-6, tolrfs=1e-6)
    s = m.run(s, f, 20)   # crosses a mixing step at itt%16==0
    assert not bool(jnp.isnan(s.psi0).any())     # ps field
    assert not bool(jnp.isnan(s.ubar).any())
    assert not bool(jnp.isnan(s.t).any())
    assert float(jnp.abs(s.ubar).max()) > 0.0    # wind spun up a flow
    assert float(jnp.abs(s.ubar).max()) < 1e3    # bounded [cm/s]


def test_rigid_lid_divergence_constraint():
    """After the correction step the barotropic transport is
    non-divergent up to solver tolerance."""
    m, s, f = _setup(barotropic="surface_pressure", mxscan=500,
                     tolrsp=1e-8)
    s = m.run(s, f, 5)
    div = _sp_divergence(m, s)
    # raw forcing divergence scale for comparison
    zu_scale = float(jnp.abs(s.ubar).max())
    h_scale = float(jnp.abs(m.g.h).max())
    dx = float(m.g.dxu.min())
    assert div < 1e-4 * zu_scale * h_scale * dx


def test_surface_pressure_euler_backward():
    m, s, f = _setup(barotropic="surface_pressure", eb=True,
                     mxscan=300, tolrsp=1e-6)
    s = m.run(s, f, 18)
    assert not bool(jnp.isnan(s.t).any())
    assert not bool(jnp.isnan(s.ubar).any())


def test_surface_pressure_scan_driver():
    m, s, f = _setup(barotropic="surface_pressure", mxscan=200,
                     tolrsp=1e-6)
    s = m.run_scan(s, f, 18)
    assert not bool(jnp.isnan(s.t).any())
    assert not bool(jnp.isnan(s.ubar).any())


@pytest.mark.parametrize("kw", [
    dict(fct_variant="dlm2"),
    dict(fct_3d=True),
    dict(fct_variant="dlm2", fct_3d=True),
])
def test_fct_variant_stable_and_bounded(kw):
    """dlm2 / 3-d FCT delimiters (tracer_adv_flx.F:376-1005 O_fct_dlm2
    / O_fct_3d): stable and monotone (no new extrema beyond the IC
    range) in the model; the smooth spinup may not activate the extra
    delimiters, so the behavioural difference is asserted at flux level
    in test_fct_variant_flux_level."""
    m, s, f = _setup(tracer_advection="fct", **kw)
    s = m.run(s, f, 20)
    t = np.asarray(s.t[0])
    assert not np.isnan(t).any()
    assert t.max() < 20.5 and t.min() > -0.5   # FCT monotonicity


def test_fct_variant_flux_level():
    """On harsh fields the dlm2 extrema and the 3-d delimiter produce
    genuinely different corrected fluxes than dlm1."""
    from uvic_tpu.ops.advection import fct_flux
    km, jmt, imt = 4, 8, 10
    rng = np.random.default_rng(0)
    t_tau = jnp.asarray(rng.normal(size=(1, km, jmt, imt))) * 5
    t_tm1 = t_tau + 0.3 * jnp.asarray(
        rng.normal(size=(1, km, jmt, imt)))
    vet = jnp.asarray(rng.normal(size=(1, km, jmt, imt))) * 50
    vnt = jnp.asarray(rng.normal(size=(1, km, jmt, imt))) * 50
    vbt = jnp.asarray(rng.normal(size=(1, km, jmt, imt))) * 5
    tmask = jnp.ones((1, km, jmt, imt))
    c2dt = jnp.full((1, km, 1, 1), 7200.0)
    args = (t_tau, t_tm1, vet, vnt, vbt, tmask, c2dt,
            jnp.full((jmt, imt), 1 / 4e7), jnp.full((jmt, 1), 1 / 4e7),
            jnp.full((km, 1, 1), 1 / 1e4))
    base = fct_flux(*args)
    f3d = fct_flux(*args, fct3d=True)
    dlm2 = fct_flux(*args, variant="dlm2")
    assert float(jnp.abs(base[0] - f3d[0]).max()) > 0.0
    assert float(jnp.abs(base[0] - dlm2[0]).max()) > 0.0


def test_neptune_topographic_stress():
    """O_neptune (neptune.F): the lateral friction relaxes toward the
    Holloway equilibrium flow.  Checks the pnep/unep construction
    (kmz min-of-four, snep(lat), external-mode-style differences)
    against a hand computation at one point, the field's masking, and
    that the clinic tendency responds while unep == 0 reproduces the
    plain step exactly."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from uvic_tpu.config import small_config
    from uvic_tpu.constants import OMEGA
    from uvic_tpu.models.ocean.model import make_ocean
    from uvic_tpu.models.ocean.neptune import neptune_velocity

    cfg = small_config(imt=40, jmt=34, km=8)
    cfg = cfg.replace(ocean=dataclasses.replace(cfg.ocean,
                                                neptune=True))
    m = make_ocean(cfg)
    g = m.params.grid
    topo = m.params.topo
    unep = np.asarray(m.unep)
    assert np.isfinite(unep).all()
    assert np.abs(unep).max() > 0.0

    # hand check at an interior wet point
    kmu = np.asarray(topo.kmu)
    j, i = 16, 12
    kmz = min(kmu[j - 1, i - 1], kmu[j, i - 1], kmu[j - 1, i],
              kmu[j, i])

    def pnep_at(jj, ii):
        kz = min(kmu[jj - 1, ii - 1], kmu[jj, ii - 1],
                 kmu[jj - 1, ii], kmu[jj, ii])
        tl = np.deg2rad(np.asarray(g.yt)[jj])
        f = 2.0 * OMEGA * np.sin(tl)
        snep = cfg.ocean.spnep + (cfg.ocean.senep - cfg.ocean.spnep) \
            * (0.5 + 0.5 * np.cos(2.0 * tl))
        h = np.asarray(g.zw)[kz - 1] if kz > 0 else 0.0
        return -f * snep ** 2 * h

    d1 = pnep_at(j + 1, i + 1) - pnep_at(j, i)
    d0 = pnep_at(j + 1, i) - pnep_at(j, i + 1)
    u_exp = -(d1 + d0) * np.asarray(g.dyu2r)[j] * np.asarray(topo.hr)[j, i]
    np.testing.assert_allclose(unep[0, j, i], u_exp, rtol=1e-12)

    # clinic response: unep=None == plain; real unep changes the step
    from uvic_tpu.models.ocean.kernels import adv_vel, clinic_step
    from uvic_tpu.models.ocean.model import eos_state_from
    rng = np.random.default_rng(3)
    u0 = np.zeros((2, g.km, g.jmt, g.imt))
    u0[0] = 3.0 * np.asarray(m.umask)
    u0 = jnp.asarray(u0)
    rho = eos_state_from(m.eos_c, m.eos_to, m.eos_so, jnp.asarray(
        np.zeros((2, g.km, g.jmt, g.imt))))
    _, _, _, veu, vnu, vbu = adv_vel(u0[0], u0[1], m.g, True)
    smf = jnp.zeros((2, g.jmt, g.imt))
    plain, _ = clinic_step(u0, u0, rho, veu, vnu, vbu, smf, smf,
                           m.visc_cbu, m.kmu, m.umask, m.g, 3600.0,
                           True)
    with_zero, _ = clinic_step(u0, u0, rho, veu, vnu, vbu, smf, smf,
                               m.visc_cbu, m.kmu, m.umask, m.g, 3600.0,
                               True, unep=jnp.zeros((2, g.jmt, g.imt)))
    np.testing.assert_array_equal(np.asarray(plain),
                                  np.asarray(with_zero))
    with_nep, _ = clinic_step(u0, u0, rho, veu, vnu, vbu, smf, smf,
                              m.visc_cbu, m.kmu, m.umask, m.g, 3600.0,
                              True, unep=m.unep)
    assert np.abs(np.asarray(with_nep) - np.asarray(plain)).max() > 0.0
    # and the full model step runs finite with neptune on
    t0 = np.zeros((m.nt, g.km, g.jmt, g.imt))
    t0[0] = 10.0 * np.asarray(m.tmask)
    from uvic_tpu.models.ocean.model import make_forcing
    st = m.step(m.init_state(t0), make_forcing(smf, jnp.zeros(
        (m.nt, g.jmt, g.imt))), leapfrog=False)
    assert np.isfinite(np.asarray(st.u)).all()
