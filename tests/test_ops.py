"""Unit tests for core numerical ops: tridiagonal solve, convection, FCT."""

import jax.numpy as jnp
import numpy as np

from uvic_tpu.ops.convection import convct_full, convct_ncon
from uvic_tpu.ops.eos import fit_eos
from uvic_tpu.ops.tridiag import solve_tridiag_masked
from uvic_tpu.ops.advection import fct_flux, upstream_flux
from uvic_tpu.ops.stencil import UP, W, S


def test_tridiag_vs_dense():
    rng = np.random.default_rng(1)
    km, ncol = 12, 5
    a = np.zeros((km, ncol)); b = np.zeros((km, ncol)); c = np.zeros((km, ncol))
    f = rng.normal(size=(km, ncol))
    a[1:] = -rng.uniform(0.1, 1.0, (km - 1, ncol))
    c[:-1] = -rng.uniform(0.1, 1.0, (km - 1, ncol))
    b = 1.0 - a - c
    mask = np.ones((km, ncol))
    z = solve_tridiag_masked(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                             jnp.asarray(f), jnp.asarray(mask))
    for i in range(ncol):
        M = np.diag(b[:, i]) + np.diag(a[1:, i], -1) + np.diag(c[:-1, i], 1)
        np.testing.assert_allclose(np.asarray(z[:, i]),
                                   np.linalg.solve(M, f[:, i]), rtol=1e-10)


def test_tridiag_masked_columns():
    km, ncol = 6, 3
    a = np.zeros((km, ncol)); c = np.zeros((km, ncol))
    a[1:] = -0.3; c[:-1] = -0.3
    b = 1.0 - a - c
    f = np.ones((km, ncol))
    mask = np.ones((km, ncol)); mask[3:, 1] = 0.0; mask[:, 2] = 0.0
    z = np.asarray(solve_tridiag_masked(*map(jnp.asarray, (a, b, c, f, mask))))
    assert np.isfinite(z).all()
    assert (z[3:, 1] == 0).all() and (z[:, 2] == 0).all()


def _conv_setup():
    km = 6
    zt = (np.arange(km) + 0.5) * 100.0e2
    eos = fit_eos(zt)
    dz = np.full(km, 100.0e2)
    return km, eos, jnp.asarray(dz)


def test_convection_stabilizes_and_conserves():
    km, eos, dz = _conv_setup()
    jmt = imt = 4
    kmt = jnp.full((jmt, imt), km, dtype=jnp.int32)
    # cold over warm -> statically unstable column
    t = np.zeros((2, km, jmt, imt))
    t[0] = np.linspace(2.0, 10.0, km)[:, None, None]   # T increasing downward
    t[1] = 0.0
    ts = jnp.asarray(t)
    c = jnp.asarray(eos.c); to = jnp.asarray(eos.to); so = jnp.asarray(eos.so)
    out = convct_full(ts, kmt, c, to, so, dz)
    # heat conserved per column
    np.testing.assert_allclose(
        np.asarray((out[0] * dz[:, None, None]).sum(0)),
        np.asarray((ts[0] * dz[:, None, None]).sum(0)), rtol=1e-12)
    # fully mixed (the whole column was one instability)
    assert np.asarray(out[0]).std(axis=0).max() < 1e-10

    out2 = convct_ncon(ts, kmt, c, to, so, dz, ncon=km)
    np.testing.assert_allclose(
        np.asarray((out2[0] * dz[:, None, None]).sum(0)),
        np.asarray((ts[0] * dz[:, None, None]).sum(0)), rtol=1e-12)


def test_convection_stable_profile_untouched():
    km, eos, dz = _conv_setup()
    jmt = imt = 3
    kmt = jnp.full((jmt, imt), km, dtype=jnp.int32)
    t = np.zeros((2, km, jmt, imt))
    t[0] = np.linspace(15.0, 2.0, km)[:, None, None]   # warm over cold: stable
    ts = jnp.asarray(t)
    out = convct_full(ts, kmt, jnp.asarray(eos.c), jnp.asarray(eos.to),
                      jnp.asarray(eos.so), dz)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ts), atol=1e-14)


def test_convct_full_pallas_apply():
    """The VMEM region-mean apply kernel (interpret mode) reproduces
    the XLA einsum path elementwise, including varying kmt, partial
    instabilities, and multiple tracers."""
    km, eos, dz = _conv_setup()
    jmt = imt = 5
    rng = np.random.default_rng(11)
    kmt = jnp.asarray(rng.integers(0, km + 1, size=(jmt, imt)),
                      dtype=jnp.int32)
    nt = 4
    t = np.zeros((nt, km, jmt, imt))
    t[0] = 10.0 + 3.0 * rng.standard_normal((km, jmt, imt))
    t[1] = 1e-3 * rng.standard_normal((km, jmt, imt))
    t[2:] = rng.standard_normal((nt - 2, km, jmt, imt))
    ts = jnp.asarray(t)
    args = (kmt, jnp.asarray(eos.c), jnp.asarray(eos.to),
            jnp.asarray(eos.so), dz)
    ref = convct_full(ts, *args)
    got = convct_full(ts, *args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_upstream_flux_divergence_conserves():
    # closed basin, uniform tracer: fluxes must produce zero tendency
    km, jmt, imt = 3, 6, 6
    rng = np.random.default_rng(2)
    vet = jnp.asarray(rng.normal(size=(km, jmt, imt)))
    vnt = jnp.asarray(rng.normal(size=(km, jmt, imt)))
    vbt = jnp.asarray(rng.normal(size=(km, jmt, imt)))
    t = jnp.full((km, jmt, imt), 3.14)
    fe, fn, fb = upstream_flux(t, vet, vnt, vbt)
    # for constant tracer upstream flux = centered flux = 2*v*t
    np.testing.assert_allclose(np.asarray(fe), np.asarray(2 * vet * 3.14),
                               rtol=1e-12)


def test_fct_no_new_extrema():
    # 1-D advection of a hat profile in x: FCT solution must stay within
    # the initial min/max (the whole point of the limiter)
    km, jmt, imt = 1, 4, 34
    dx = 1.0
    u = 0.3
    t0 = np.zeros((km, jmt, imt))
    t0[..., 10:16] = 1.0
    tmask = jnp.ones((km, jmt, imt))
    vet = jnp.full((km, jmt, imt), u)
    vnt = jnp.zeros((km, jmt, imt))
    vbt = jnp.zeros((km, jmt, imt))
    c2dt = jnp.full((km, 1, 1), 0.5)
    cstdxt2r = jnp.full((jmt, imt), 0.5 / dx)
    cstdyt2r = jnp.full((jmt, 1), 0.5)
    dzt2r = jnp.full((km, 1, 1), 0.5)

    t_tau = jnp.asarray(t0)
    t_tm1 = jnp.asarray(t0)
    for _ in range(20):
        fe, fn, fb = fct_flux(t_tau, t_tm1, vet, vnt, vbt, tmask,
                              c2dt, cstdxt2r, cstdyt2r, dzt2r)
        adv_x = (fe - W(fe)) * cstdxt2r
        t_new = t_tm1 - c2dt * adv_x
        t_new = t_new.at[..., 0].set(t_new[..., -2])
        t_new = t_new.at[..., -1].set(t_new[..., 1])
        t_tm1, t_tau = t_tau, t_new
    t_fin = np.asarray(t_tau)
    assert t_fin.min() > -1e-10 and t_fin.max() < 1.0 + 1e-10
    # mass conserved (cyclic interior)
    np.testing.assert_allclose(t_fin[0, 1, 1:-1].sum(),
                               t0[0, 1, 1:-1].sum(), rtol=1e-12)


# ---------------------------------------------------------------------------
# high-latitude zonal filters (filfir.F / filt.F+filtr.F)
# ---------------------------------------------------------------------------

def test_fir_matrix_matches_unrolled():
    """The precomputed matrix filter reproduces the pass-by-pass FIR."""
    import numpy as np
    import jax.numpy as jnp
    from uvic_tpu.ops.filters import build_fir_filter, fir_filter

    rng = np.random.default_rng(0)
    km, jmt, imt = 3, 10, 16
    mask = (rng.random((km, jmt, imt)) > 0.3).astype(np.float64)
    mask[..., 0] = mask[..., -2]
    mask[..., -1] = mask[..., 1]
    npass = np.array([0, 0, 1, 3, 0, 0, 2, 4, 0, 0])
    field = rng.standard_normal((2, km, jmt, imt))

    ref = fir_filter(jnp.asarray(field), jnp.asarray(mask)[None], npass,
                     "symmetric", True)
    out = build_fir_filter(mask, npass, "symmetric", True,
                           np.float64)(jnp.asarray(field))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12)

    ref = fir_filter(jnp.asarray(field), jnp.asarray(mask)[None], npass,
                     "asymmetric", True)
    out = build_fir_filter(mask, npass, "asymmetric", True,
                           np.float64)(jnp.asarray(field))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12)


def test_fourier_filter_truncates_and_preserves():
    """Fourier variant: idempotent projection; keeps retained low modes
    exactly on a land-free cyclic row; identity on unfiltered rows."""
    import numpy as np
    import jax.numpy as jnp
    from uvic_tpu.ops.filters import build_fourier_filter

    jmt, imt = 8, 34
    ni = imt - 2
    mask = np.ones((jmt, imt))
    lat = np.array([-85.0, -75.0, -60.0, 0.0, 30.0, 70.0, 80.0, 85.0])
    filt = build_fourier_filter(mask, lat, "symmetric", True, np.float64)

    x = np.arange(ni) * 2 * np.pi / ni
    low = np.cos(2 * x)          # wavenumber 2: kept everywhere filtered
    hi = np.cos(14 * x)          # wavenumber 14: cut at high lat
    f = np.zeros((jmt, imt))
    f[:, 1:-1] = low + hi
    f[:, 0] = f[:, -2]
    f[:, -1] = f[:, 1]
    out = np.asarray(filt(jnp.asarray(f)))

    # unfiltered mid-latitude rows unchanged
    np.testing.assert_allclose(out[2:5], f[2:5], atol=1e-12)
    # 85-deg rows: n = nint(32*cos(85)/cos(67.5)) = 7 -> mode 14 removed,
    # mode 2 kept
    np.testing.assert_allclose(out[0, 1:-1], low, atol=1e-9)
    np.testing.assert_allclose(out[-1, 1:-1], low, atol=1e-9)
    # projection: applying twice = applying once
    np.testing.assert_allclose(np.asarray(filt(jnp.asarray(out))), out,
                               atol=1e-9)


def test_fourier_filter_segments_identity_on_land():
    import numpy as np
    import jax.numpy as jnp
    from uvic_tpu.ops.filters import build_fourier_filter

    jmt, imt = 4, 26
    mask = np.ones((jmt, imt))
    mask[:, 5:9] = 0.0         # a land block -> two segments on the circle
    lat = np.array([-85.0, 0.0, 0.0, 85.0])
    filt = build_fourier_filter(mask, lat, "symmetric", True, np.float64)
    rng = np.random.default_rng(1)
    f = rng.standard_normal((jmt, imt))
    out = np.asarray(filt(jnp.asarray(f)))
    # land points untouched
    np.testing.assert_allclose(out[:, 5:9], f[:, 5:9], atol=1e-12)
    # cosine projection preserves the segment mean-ish structure: the
    # constant function is in the kept basis -> constants are fixed points
    c = np.ones((jmt, imt))
    np.testing.assert_allclose(np.asarray(filt(jnp.asarray(c))), c,
                               atol=1e-9)


def test_bicgstab_safe_solves_and_survives_breakdown():
    """ops/solvers.bicgstab_safe: converges on a diagonally-dominant
    5-point system to the direct solution, and a degenerate RHS (zero)
    returns the guess without NaN (the jax.scipy bicgstab would divide
    0/0 on TPU where denormal dot products flush to zero)."""
    import numpy as np
    import jax.numpy as jnp
    from uvic_tpu.ops.solvers import bicgstab_safe

    rng = np.random.default_rng(0)
    n = 12
    diag = 4.0 + rng.random((n, n))

    def mv(x):
        return (diag * x
                - jnp.roll(x, 1, 0) - jnp.roll(x, -1, 0)
                - 0.9 * jnp.roll(x, 1, 1) - 0.9 * jnp.roll(x, -1, 1))

    b = jnp.asarray(rng.standard_normal((n, n)))
    M = lambda r: r / diag
    x = bicgstab_safe(mv, b, jnp.zeros_like(b), M, 1e-12, 200)
    assert float(jnp.abs(mv(x) - b).max()) < 1e-8

    # degenerate: zero RHS, converged at entry -> returns guess, no NaN
    x0 = jnp.asarray(rng.standard_normal((n, n))) * 0.0
    x = bicgstab_safe(mv, jnp.zeros_like(b), x0, M, 1e-12, 200)
    assert not bool(jnp.isnan(x).any())
    assert float(jnp.abs(x).max()) == 0.0
