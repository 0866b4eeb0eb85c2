"""EOS polynomial fit accuracy vs the UNESCO formula it approximates."""

import numpy as np

from uvic_tpu.ops.eos import (EosCoefficients, dens, drodt, drods, fit_eos,
                              potential_temperature, unesco_density)


def test_unesco_reference_values():
    # Gill (1982) appendix check values: rho(T=0 C, S=35, p=0) ~ 1028.1 kg/m3
    rho = unesco_density(0.0, 35.0, 0.0)
    assert abs(rho - 1028.106) < 0.01
    rho = unesco_density(10.0, 35.0, 0.0)
    assert abs(rho - 1026.95) < 0.05
    # compressibility: density increases with depth
    assert unesco_density(0.0, 35.0, 4000.0) > rho + 15.0


def test_potem_monotone():
    # potential temperature < in-situ at depth for warm water
    th = potential_temperature(5.0, 35.0, 4000.0)
    assert 4.0 < th < 5.0


def test_fit_accuracy():
    zt = np.array([25.0e2, 500.0e2, 2000.0e2, 4000.0e2])
    eos = fit_eos(zt)
    rng = np.random.default_rng(0)
    for k, z in enumerate(zt):
        z_m = z / 100.0
        ib = min(int(z_m / 250.0), 32)
        # sample in-range potential temps and salinities
        th = rng.uniform(eos.tmin[k], eos.tmax[k], 50)
        s_psu = rng.uniform(eos.smin[k], eos.smax[k], 50)
        s_model = (s_psu - 35.0) / 1000.0
        rho_poly = dens(eos.c[k], th - eos.to[k], s_model - eos.so[k])
        # ground truth: invert potential temperature to in-situ (1 Newton
        # step is plenty for this weak correction), then UNESCO sigma
        t_insitu = th.copy()
        for _ in range(3):
            t_insitu += th - potential_temperature(t_insitu, s_psu, z_m)
        sigma = (unesco_density(t_insitu, s_psu, z_m) - 1.0e3 + 2.5e-2)
        rho_true = sigma * 1.0e-3 - eos.ro0[k]
        # cubic fit over the full per-level T/S range is good to ~1e-2
        # sigma units (surface bin is widest); deep levels are much tighter
        tol = 1.0e-5 if z_m < 250 else 1.0e-6
        assert np.max(np.abs(rho_poly - rho_true)) < tol


def test_derivatives_consistent():
    zt = np.array([25.0e2])
    eos = fit_eos(zt)
    c = eos.c[0]
    t0, s0 = 2.0, 0.001
    eps = 1e-6
    dt_num = (dens(c, t0 + eps, s0) - dens(c, t0 - eps, s0)) / (2 * eps)
    ds_num = (dens(c, t0, s0 + eps) - dens(c, t0, s0 - eps)) / (2 * eps)
    np.testing.assert_allclose(drodt(c, t0, s0), dt_num, rtol=1e-6)
    np.testing.assert_allclose(drods(c, t0, s0), ds_num, rtol=1e-6)
