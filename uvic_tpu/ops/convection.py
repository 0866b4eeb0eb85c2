"""Convective adjustment schemes.

TPU-native re-design of source/mom/convect.F:

- ``convct_ncon``: the standard alternating-pair scheme (convect.F:1-97),
  directly vectorized over all columns.
- ``convct_full``: the complete-removal scheme (O_fullconvect, convct2,
  convect.F:99-311, Rahmstorf 1993).  The reference chases instabilities
  per column with data-dependent while loops; here the same fixed point
  is reached by parallel *region merging*: every level starts as its own
  region, adjacent regions are merged wherever the (thickness-weighted)
  region means are statically unstable at the interface, and the process
  iterates to a fixed point (at most km-1 merges per column).  Since
  mixing is linear averaging with fixed weights, region means are always
  computed from the original profile, so the iteration state is only the
  per-level region label — a cummax over the column.

Stability comparisons use the EOS coefficients of the *upper level of the
lower region* (convect.F:201-204,232-235 reference potential density at
the interface), matching statec's ``ind`` convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .eos import dens


def _pair_density(eos_c, eos_to, eos_so, t, s):
    """Densities of levels k and k+1 both referenced to level k+1's
    coefficients, for all k (statec, state.F:64-131)."""
    c_dn = eos_c[1:]          # coefficients of the lower level (k+1)
    to_dn = eos_to[1:]
    so_dn = eos_so[1:]
    rho_up = dens(c_dn[:, None, None, :],
                  t[:-1] - to_dn[:, None, None],
                  s[:-1] - so_dn[:, None, None])
    rho_dn = dens(c_dn[:, None, None, :],
                  t[1:] - to_dn[:, None, None],
                  s[1:] - so_dn[:, None, None])
    return rho_up, rho_dn


def convct_ncon(ts, kmt, eos_c, eos_to, eos_so, dztxcl, ncon: int):
    """Standard convection scheme: ``ncon`` passes of alternating-parity
    pair mixing (convect.F:52-89). ts is (nt, km, jmt, imt) with T=ts[0],
    S=ts[1]; returns adjusted tracers."""
    km = ts.shape[1]
    w = dztxcl.reshape(km, 1, 1)
    kk = jnp.arange(km - 1).reshape(km - 1, 1, 1)
    below_ocean = (kk + 1 < kmt[None]).astype(ts.dtype)

    def one_phase(ts, parity):
        rho_up, rho_dn = _pair_density(eos_c, eos_to, eos_so, ts[0], ts[1])
        unstable = (rho_up > rho_dn) & (kk % 2 == parity) & (below_ocean > 0)
        mixed = (w[:-1] * ts[:, :-1] + w[1:] * ts[:, 1:]) / (w[:-1] + w[1:])
        # a level is either the upper or the lower member of a pair in one
        # parity phase, never both: apply both writes as one select
        pad = jnp.zeros_like(unstable[:1])
        as_up = jnp.concatenate([unstable, pad], axis=0)[None]
        as_dn = jnp.concatenate([pad, unstable], axis=0)[None]
        padm = mixed[:, :1]
        mix_up = jnp.concatenate([mixed, padm], axis=1)
        mix_dn = jnp.concatenate([padm, mixed], axis=1)
        return jnp.where(as_up, mix_up, jnp.where(as_dn, mix_dn, ts))

    for _ in range(ncon):
        for parity in (0, 1):
            ts = one_phase(ts, parity)
    return ts


def _region_means(ts, label, w):
    """Thickness-weighted mean of each level's region, from the original
    profile. label[k] = index of the region's top level (non-decreasing).

    Implemented gather-free: the region membership matrix
    M[k1,k2] = (label[k1] == label[k2]) contracts with the profile in two
    small (km x km) einsums — VPU/MXU work instead of latency-bound
    take_along_axis gathers (km <= ~20, so M is tiny)."""
    same = (label[:, None] == label[None, :]).astype(ts.dtype)  # (k,k,j,i)
    wfull = jnp.broadcast_to(w, ts.shape[1:])
    sum_tw = jnp.einsum("kl...,nl...->nk...", same, ts * w)
    sum_w = jnp.einsum("kl...,l...->k...", same, wfull)
    return sum_tw / sum_w


def _apply_region_means_pallas(ts, mnorm, ocean, interpret=False):
    """Apply the normalized region-mixing matrix to all tracers in one
    VMEM-resident Pallas kernel: out[n, k] = sum_l M[k, l] * ts[n, l]
    on ocean cells.

    The XLA einsum formulation re-streams the (km, km, jmt, imt)
    membership matrix per tracer batch and lowers to a layout-hostile
    batched dot (batch dims minor); here M stays VMEM-resident across
    the nt-grid and the contraction is km^2 unrolled tile FMAs per
    tracer."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nt, km, jmt, imt = ts.shape

    def kern(t_ref, m_ref, oc_ref, out_ref):
        t = t_ref[0]
        M = m_ref[:]
        out = M[:, 0] * t[0][None]
        for l in range(1, km):
            out = out + M[:, l] * t[l][None]
        out_ref[0] = jnp.where(oc_ref[:] > 0, out, t)

    per_n4 = pl.BlockSpec((1, km, jmt, imt), lambda n: (n, 0, 0, 0))
    full4 = pl.BlockSpec((km, km, jmt, imt), lambda n: (0, 0, 0, 0))
    full3 = pl.BlockSpec((km, jmt, imt), lambda n: (0, 0, 0))
    call = pl.pallas_call(
        kern, grid=(nt,),
        in_specs=[per_n4, full4, full3],
        out_specs=per_n4,
        out_shape=jax.ShapeDtypeStruct(ts.shape, ts.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret)
    return call(ts, mnorm, ocean)


def _stable_labels(ts, kmt, eos_c, eos_to, eos_so, dztxcl,
                   max_iter=None):
    """Fixed-point region labels of the complete-removal scheme
    (convct2): label[k] = top level index of the statically-stable
    mixed region containing level k."""
    km = ts.shape[1]
    if max_iter is None:
        max_iter = km
    w = dztxcl.reshape(km, 1, 1)
    idx = jnp.arange(km).reshape(km, 1, 1)
    ocean = (idx < kmt[None]).astype(ts.dtype)
    to = eos_to[:, None, None]
    so = eos_so[:, None, None]
    cc = eos_c[:, None, None, :]

    def body(carry):
        label, _, it = carry
        means = _region_means(ts[:2], label, w)    # (2, km, j, i)
        # interface above level s (s = region start > 0): upper region
        # mean is at s-1, lower at s; reference coefficients of level s
        mt_up = jnp.concatenate([means[0, :1], means[0, :-1]], axis=0)
        ms_up = jnp.concatenate([means[1, :1], means[1, :-1]], axis=0)
        rho_up = dens(cc, mt_up - to, ms_up - so)
        rho_dn = dens(cc, means[0] - to, means[1] - so)
        unstable = (rho_up > rho_dn) & (ocean > 0) & (idx > 0)
        start = (label == idx)
        new_start = start & ~unstable
        new_start = new_start.at[0].set(True)
        new_label = jax.lax.cummax(
            jnp.where(new_start, idx, -1).astype(label.dtype), axis=0)
        changed = jnp.any(new_label != label)
        return new_label, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iter)

    label0 = jnp.broadcast_to(idx, ts.shape[1:]).astype(jnp.int32)
    label, _, _ = jax.lax.while_loop(
        cond, body, (label0, jnp.asarray(True), jnp.asarray(0)))
    return label


def convection_extent(ts, kmt, eos_c, eos_to, eos_so, dztxcl, dzt):
    """Diagnostic: (depth_cm, nregions) of convective mixing per column
    (mom_tavg.F O_save_convection excnv/ventilation rows).

    depth_cm  : thickness of the surface-connected mixed region
    nregions  : number of distinct stable regions shallower than the
                bottom (km - merges; a fully stratified column returns
                its ocean level count)
    """
    km = ts.shape[1]
    label = _stable_labels(ts, kmt, eos_c, eos_to, eos_so, dztxcl)
    idx = jnp.arange(km).reshape(km, 1, 1)
    ocean = idx < kmt[None]
    in_surf = (label == 0) & ocean
    depth = jnp.sum(in_surf * dzt.reshape(km, 1, 1), axis=0)
    nreg = jnp.sum((label == idx) & ocean, axis=0)
    return depth, nreg


def convct_full(ts, kmt, eos_c, eos_to, eos_so, dztxcl, max_iter=None,
                use_pallas=False, interpret=False):
    """Complete convective adjustment (convct2 fixed point).

    Returns tracers with every column's final profile statically stable:
    any two vertically adjacent mixed regions are stable at their
    interface w.r.t. the interface reference level.

    use_pallas: apply the final region means through the VMEM-resident
    kernel (TPU perf path; numerics identical, see
    tests/test_ops.py::test_convct_full_pallas_apply).
    """
    nt, km = ts.shape[0], ts.shape[1]
    w = dztxcl.reshape(km, 1, 1)
    idx = jnp.arange(km).reshape(km, 1, 1)
    ocean = (idx < kmt[None]).astype(ts.dtype)
    label = _stable_labels(ts, kmt, eos_c, eos_to, eos_so, dztxcl,
                           max_iter)
    if use_pallas or interpret:
        same = (label[:, None] == label[None, :]).astype(ts.dtype)
        wfull = jnp.broadcast_to(w, ts.shape[1:])
        sum_w = jnp.einsum("kl...,l...->k...", same, wfull)
        mnorm = same * wfull[None] / sum_w[:, None]
        return _apply_region_means_pallas(ts, mnorm,
                                          jnp.broadcast_to(
                                              ocean, ts.shape[1:]),
                                          interpret=interpret)
    means = _region_means(ts, label, w)
    return jnp.where(ocean[None] > 0, means, ts)


def convct_brine(ts, cbf, cba, cba0, kmt, eos_c, eos_to, eos_so,
                 dztxcl, c2dtts, zw0, dtxcel0=1.0):
    """Brine-rejection convection (convect_brine.F:1-101, O_convect_brine).

    Under each ice category nc the category's brine salt flux
    ``cbf[nc]`` [salt-unit cm/s] is injected into the surface level
    (the reference's density-contrast spreading depth is disabled,
    cont=0, convect_brine.F:45), complete convection (convct2) runs on
    the perturbed profile, and the final tracers are the category-
    area-weighted mean of the convected profiles; the ice-free part
    ``cba0`` convects unperturbed.

    ts   : (nt, km, jmt, imt) tracers at tau+1 (pre-convection)
    cbf  : (ncat+1, jmt, imt) per-category brine fluxes (index 0 = open
           water / lead ice growth)
    cba  : (ncat+1, jmt, imt) per-category area weights
    cba0 : (jmt, imt) ice-free weight; cba0 + sum(cba) = 1
    zw0  : depth of the bottom of level 1 [cm]
    """
    ncatp1 = cbf.shape[0]
    out = cba0[None, None] * convct_full(ts, kmt, eos_c, eos_to,
                                         eos_so, dztxcl)
    fac = c2dtts * dtxcel0 / zw0
    for nc in range(ncatp1):
        tsp = ts.at[1, 0].add(fac * cbf[nc])
        out = out + cba[nc][None, None] * convct_full(
            tsp, kmt, eos_c, eos_to, eos_so, dztxcl)
    return out
