"""Elliptic solvers: island-constrained preconditioned conjugate gradient.

TPU-native re-design of source/mom/congrad.F (Dukowicz, Smith & Malone
1993).  The reference's island-perimeter machinery (iperm/jperm gather
loops, congrad.F:933-1040) becomes dense segment reductions over a
perimeter-id map: ``sum_dist`` is one scatter-add plus one gather, which
jits cleanly and shards with a single psum over island partials.  The CG
loop is a `lax.while_loop` with the reference's geometric-series error
extrapolation as the convergence predicate (congrad.F:62-105,415-426).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class IslandIndex:
    """Dense island-perimeter indexing (replaces iperm/jperm/iofs lists)."""
    perim_id: Any          # (jmt, imt) int32: island index or -1
    nisle: int
    counts: Any            # (nisle,) perimeter cell counts
    imain: int             # island whose psi is normalized to zero
    ocean_mask: Any        # (jmt, imt) 1.0 where land_map <= 0 (ocean+perim)


def island_sum(x, isl: IslandIndex):
    """Per-island sum of x over perimeter cells -> (nisle,) vector."""
    pid = jnp.clip(isl.perim_id, 0, max(isl.nisle - 1, 0))
    contrib = jnp.where(isl.perim_id >= 0, x, 0.0)
    return jnp.zeros((max(isl.nisle, 1),), x.dtype).at[pid.ravel()].add(
        contrib.ravel())


def sum_dist(x, isl: IslandIndex):
    """Sum perimeter contributions per island, replicate the sum at every
    perimeter cell (congrad.F:933-986)."""
    if isl.nisle == 0:
        return x
    sums = island_sum(x, isl)
    rep = sums[jnp.clip(isl.perim_id, 0, isl.nisle - 1)]
    return jnp.where(isl.perim_id >= 0, rep, x)


def avg_dist(x, isl: IslandIndex):
    """Average perimeter contributions per island, replicate
    (congrad.F:988-1040)."""
    if isl.nisle == 0:
        return x
    sums = island_sum(x, isl) / isl.counts
    rep = sums[jnp.clip(isl.perim_id, 0, isl.nisle - 1)]
    return jnp.where(isl.perim_id >= 0, rep, x)


def border(v, cyclic=True):
    """Zero meridional boundary rows, apply zonal cyclic wrap
    (poisson.F:1-60 `border`, no-symmetry branch)."""
    v = v.at[0, :].set(0.0).at[-1, :].set(0.0)
    if cyclic:
        v = v.at[:, 0].set(v[:, -2]).at[:, -1].set(v[:, 1])
    else:
        v = v.at[:, 0].set(0.0).at[:, -1].set(0.0)
    return v


def apply_op9(cf, x):
    """res = A x for the 3x3-stencil operator; cf is (3, 3, jmt, imt)
    indexed [dj+1, di+1] (congrad.F op5_vec/op9_vec). Interior only;
    borders zeroed."""
    res = jnp.zeros_like(x)
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            c = cf[dj + 1, di + 1]
            shifted = jnp.roll(x, (-dj, -di), axis=(0, 1))
            res = res + c * shifted
    res = res.at[0, :].set(0.0).at[-1, :].set(0.0)
    res = res.at[:, 0].set(0.0).at[:, -1].set(0.0)
    return res


def dot2(a, b):
    """Interior dot product (congrad.F:615-638)."""
    return jnp.sum(a[1:-1, 1:-1] * b[1:-1, 1:-1])


def absmax(a):
    return jnp.max(jnp.abs(a))


def make_inv(cf, isl: IslandIndex):
    """Diagonal preconditioner Z = 1/diag(A), with island diagonals summed
    over perimeters and replicated (congrad.F:862-930)."""
    z = cf[1, 1]
    z = sum_dist(z, isl)
    z = jnp.where(z != 0.0, 1.0 / jnp.where(z == 0.0, 1.0, z), 0.0)
    return z


def congrad(cf, guess, forc, isl: IslandIndex, tol, max_iter: int,
            cyclic=True):
    """Preconditioned CG with island constraint equations (congrad.F:1-470).

    Solves A dpsi = forc where A is the 5/9-point operator ``cf`` with
    Dirichlet island constraints folded in via perimeter sum/replicate.
    Returns (dpsi, iterations, estimated_error, converged).
    """
    dpsi = border(guess, cyclic)
    z = border(make_inv(cf, isl), cyclic)

    # Constant-mode deflation.  Land rows/columns of the curl-form
    # operator are exactly zero (hr vanishes at every U cell touching a
    # land T cell), and the remaining active rows have zero row sums,
    # so "ones on the active set" is an exact null vector.  Any
    # round-off/filter inconsistency in the RHS grows secularly along
    # it: the iterate reaches O(1e12x) the physical signal before the
    # post-solve island normalization (tropic.F:231-237 con_adjust,
    # which exists precisely because of this drift) cancels it —
    # catastrophically, leaving psi accurate to only ~1e-4 relative.
    # Deflating the preconditioned residual and the returned iterate
    # (standard deflated CG) keeps everything at signal scale and makes
    # the solve insensitive to reduction ordering.  The active set is
    # where the preconditioner diagonal is nonzero (make_inv masks
    # no-equation cells, congrad.F:871-874).
    w = border((z != 0.0).astype(z.dtype), cyclic)
    ww = dot2(w, w)

    def deflate(x):
        return x - (dot2(x, w) / ww) * w

    res = forc - apply_op9(cf, dpsi)
    res = res.at[0, :].set(0.0).at[-1, :].set(0.0)
    res = deflate(border(res, cyclic))

    def inv_op(r):
        return border(sum_dist(z * r, isl), cyclic)

    zres0 = inv_op(res)
    trivially_done = 100.0 * absmax(zres0) < tol

    dtype = guess.dtype
    state0 = dict(
        k=jnp.asarray(0, jnp.int32),
        dpsi=dpsi, res=res, s=jnp.zeros_like(dpsi),
        betakm1=jnp.asarray(1.0, dtype),
        step=jnp.asarray(0.0, dtype),
        step1=jnp.asarray(0.0, dtype),
        est=jnp.asarray(100.0, dtype) * absmax(zres0),
        done=trivially_done,
    )

    def cond(st):
        return (~st["done"]) & (st["k"] < max_iter)

    def body(st):
        k = st["k"] + 1
        zres = deflate(inv_op(st["res"]))
        betak = dot2(zres, st["res"])
        # guard the recurrence against an exactly-zero betakm1 (f32 on
        # TPU flushes denormal residual dot-products to zero before the
        # convergence estimate fires; same guard as the Pallas kernel)
        denom_b = jnp.where(jnp.abs(st["betakm1"]) > 0.0,
                            st["betakm1"], 1.0)
        s = zres + (betak / denom_b) * st["s"]
        As = border(apply_op9(cf, s), cyclic)
        s_dot_As = dot2(s, As)
        safe = jnp.abs(s_dot_As) > jnp.abs(betak) * 1.0e-10
        alpha = jnp.where(safe, betak / jnp.where(safe, s_dot_As, 1.0), 0.0)
        dpsi = st["dpsi"] + alpha * s
        res = st["res"] - alpha * As
        res = deflate(border(avg_dist(res, isl), cyclic))
        smax = absmax(s)
        step = jnp.abs(alpha) * smax
        step1 = jnp.where(k == 1, step, st["step1"])
        # geometric-series error extrapolation (congrad.F:415-426)
        small = step < tol
        rate = jnp.where(
            (k > 1) & small,
            jnp.exp(jnp.log(jnp.maximum(step / step1, 1e-300))
                    / jnp.maximum(k - 1, 1)),
            jnp.asarray(0.0, dtype))
        est = jnp.where(k == 1, step,
                        jnp.where(small, step * rate / (1.0 - rate),
                                  st["est"]))
        done = jnp.where(k == 1, step < tol, small & (est < tol))
        done = done | ~safe
        return dict(k=k, dpsi=dpsi, res=res, s=s, betakm1=betak,
                    step=step, step1=step1, est=est, done=done)

    st = jax.lax.while_loop(cond, body, state0)
    converged = st["done"] | trivially_done
    return deflate(st["dpsi"]), st["k"], st["est"], converged


def bicgstab_safe(matvec, b, x0, M, tol, maxiter):
    """Breakdown-guarded BiCGSTAB (van der Vorst 1992) for the EMBM
    transport solves (solve.F solver-zoo replacement).

    jax.scipy's bicgstab divides by rho/omega without guards; on TPU
    the nondeterministic f32 reductions can flush a tiny dot product
    to exactly zero mid-iteration, and one 0/0 poisons the whole fused
    segment program.  Here every division is guarded and the iterate
    freezes once converged or broken down (the last finite iterate is
    returned — for the diagonally-dominant EMBM operator a breakdown
    only happens at convergence-level residuals).
    """
    dtype = b.dtype
    tiny = jnp.asarray(1e-30, dtype)

    def sdot(a, c):
        return jnp.sum(a * c)

    def safe_div(n, d):
        ok = jnp.abs(d) > tiny
        return jnp.where(ok, n / jnp.where(ok, d, 1.0), 0.0), ok

    r0 = b - matvec(x0)
    bnorm = jnp.sqrt(sdot(b, b))
    st = dict(x=x0, r=r0, rhat=r0, p=r0,
              rho=sdot(r0, r0), k=jnp.asarray(0, jnp.int32),
              done=jnp.sqrt(sdot(r0, r0)) <= tol * jnp.maximum(
                  bnorm, tiny))

    def cond(st):
        return (~st["done"]) & (st["k"] < maxiter)

    def body(st):
        p_hat = M(st["p"])
        v = matvec(p_hat)
        alpha, ok_a = safe_div(st["rho"], sdot(st["rhat"], v))
        s = st["r"] - alpha * v
        s_hat = M(s)
        t = matvec(s_hat)
        omega, ok_o = safe_div(sdot(t, s), sdot(t, t))
        x = st["x"] + alpha * p_hat + omega * s_hat
        r = s - omega * t
        rho_new = sdot(st["rhat"], r)
        beta_f, ok_b = safe_div(rho_new * alpha, st["rho"] * omega)
        p = r + beta_f * (st["p"] - omega * v)
        rnorm = jnp.sqrt(sdot(r, r))
        done = (rnorm <= tol * jnp.maximum(bnorm, tiny)) \
            | ~(ok_a & ok_o & ok_b)
        keep = st["done"]
        sel = lambda new, old: jnp.where(keep, old, new)
        return dict(x=sel(x, st["x"]), r=sel(r, st["r"]),
                    rhat=st["rhat"], p=sel(p, st["p"]),
                    rho=jnp.where(keep, st["rho"], rho_new),
                    k=st["k"] + 1, done=st["done"] | done)

    st = jax.lax.while_loop(cond, body, st)
    return st["x"]
