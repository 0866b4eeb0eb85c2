"""Barotropic CG as a single Pallas TPU kernel.

The island-constrained conjugate gradient (ops/solvers.py congrad) is
latency-bound under XLA: every iteration is ~30 tiny ops (stencil apply,
two dot products, island segment sums) with sequential dependencies, and
the 2-D psi grid is far too small to hide launch latency (102x102 f32 =
40 KB). Here the ENTIRE solve runs inside one Pallas kernel: every
work array lives in VMEM scratch, the iteration loop is an in-kernel
`fori_loop` with a convergence predicate, islands reduce through a
dense (nisle, jmt, imt) membership tensor, and only the final dpsi and
iteration count leave the chip.

The algorithm is identical to congrad (Dukowicz/Smith/Malone 1993 with
the geometric-series error extrapolation, congrad.F:62-105).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(a, jp, ip):
    pads = [(0, 0)] * (a.ndim - 2) + [(0, jp - a.shape[-2]),
                                      (0, ip - a.shape[-1])]
    return jnp.pad(a, pads)


def make_pallas_congrad(cf, z_pre, isl_onehot, isl_counts, interior,
                        perim_mask, imt: int, jmt: int, max_iter: int,
                        cyclic: bool = True, interpret: bool = False):
    """Build a jitted pallas CG solver bound to static geometry.

    cf        : (3, 3, jmt, imt) operator coefficients at UNIT timestep
                (the kernel scales by 1/c2dtsf at entry)
    z_pre     : (jmt, imt) diagonal preconditioner at unit timestep
                (Z scales by c2dtsf)
    isl_onehot: (nisle, jmt, imt) island perimeter membership
    interior  : (jmt, imt) 1 on computed cells
    Returns solve(guess, forc, c2dtsf, tol) -> (dpsi, iters).
    """
    jp = -(-jmt // 8) * 8
    ip = -(-imt // 128) * 128
    nisle = max(isl_onehot.shape[0], 1)

    cf_flat = _pad_to(jnp.asarray(cf).reshape(9, jmt, imt), jp, ip)
    z_p = _pad_to(jnp.asarray(z_pre), jp, ip)
    oh_p = _pad_to(jnp.asarray(isl_onehot), jp, ip)
    int_p = _pad_to(jnp.asarray(interior), jp, ip)
    pm_p = _pad_to(jnp.asarray(perim_mask), jp, ip)
    rcounts = jnp.asarray(1.0 / np.maximum(np.asarray(isl_counts), 1.0))
    if rcounts.shape[0] == 0:
        rcounts = jnp.ones((1,), cf_flat.dtype)

    def shift(a, dj, di):
        # value at (j+dj, i+di); rolls wrap over the padded extent, which
        # only ever contaminates masked boundary/pad cells
        out = a
        if di:
            out = pltpu.roll(out, (-di) % ip, axis=1)
        if dj:
            out = pltpu.roll(out, (-dj) % jp, axis=0)
        return out

    def border(v):
        """cyclic wrap of the duplicated columns + zero boundary rows.
        In-kernel iota masks + roll-selects (Mosaic has no scatter and
        no captured array constants)."""
        rows = jax.lax.broadcasted_iota(jnp.int32, (jp, ip), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (jp, ip), 1)
        v = jnp.where((rows == 0) | (rows >= jmt - 1), 0.0, v)
        if cyclic:
            # col 0 <- col imt-2 ; col imt-1 <- col 1
            vL = pltpu.roll(v, (0 - (imt - 2)) % ip, axis=1)
            vR = pltpu.roll(v, (imt - 2) % ip, axis=1)
            v = jnp.where(cols == 0, vL, v)
            v = jnp.where(cols == imt - 1, vR, v)
        else:
            v = jnp.where((cols == 0) | (cols == imt - 1), 0.0, v)
        return jnp.where(cols >= imt, 0.0, v)

    def kernel(cf_ref, z_ref, oh_ref, int_ref, pm_ref, rc_ref,
               guess_ref, forc_ref, scal_ref,
               dpsi_out, iters_out, res_ref, s_ref, as_ref, zres_ref):
        c2dtsf = scal_ref[0]
        tol = scal_ref[1]
        zmat = z_ref[:] * c2dtsf
        intm = int_ref[:]
        pm = pm_ref[:]

        def apply_op(x):
            acc = jnp.zeros_like(x)
            i9 = 0
            for dj in (-1, 0, 1):
                for di in (-1, 0, 1):
                    acc = acc + cf_ref[i9] * shift(x, dj, di)
                    i9 += 1
            return acc * intm * (1.0 / c2dtsf)

        # islands: static unrolled loop of scalar reductions (vector-
        # shaped reduces crash the Mosaic compiler)
        def island_sum_dist(x):
            if nisle == 0:
                return x
            rep = jnp.zeros_like(x)
            for k in range(nisle):
                s_k = jnp.sum(oh_ref[k] * x)
                rep = rep + oh_ref[k] * s_k
            return jnp.where(pm > 0, rep, x)

        def island_avg_dist(x):
            if nisle == 0:
                return x
            rep = jnp.zeros_like(x)
            for k in range(nisle):
                s_k = jnp.sum(oh_ref[k] * x) * rc_ref[k]
                rep = rep + oh_ref[k] * s_k
            return jnp.where(pm > 0, rep, x)

        def dot2(a, b):
            return jnp.sum(a * b * intm)

        def inv_op(r):
            return border(island_sum_dist(zmat * r))

        # constant-mode deflation (see ops/solvers.py congrad): ones on
        # the ACTIVE set (nonzero preconditioner diagonal) is an exact
        # null vector of the curl-form operator; project it out of the
        # preconditioned residual and iterate to stop the secular
        # growth that destroys the solution by cancellation
        wvec = border((z_ref[:] != 0.0).astype(z_ref.dtype))
        ww = dot2(wvec, wvec)

        def deflate(x):
            return x - (dot2(x, wvec) / ww) * wvec

        # work arrays live in VMEM scratch refs; the loop carries scalars
        # only (ref-mutation is the idiomatic Mosaic stateful loop)
        dpsi_out[:] = deflate(border(guess_ref[:]))
        res_ref[:] = deflate(
            border((forc_ref[:] - apply_op(dpsi_out[:])) * intm))
        s_ref[:] = jnp.zeros_like(res_ref[:])
        zres0 = inv_op(res_ref[:])
        trivially_done = 100.0 * jnp.max(jnp.abs(zres0)) < tol
        dtype = zres0.dtype

        def body(i, st):
            betakm1, step1, est, iters, done = st
            live = jnp.where(done, 0.0, 1.0).astype(dtype)
            zres = deflate(inv_op(res_ref[:]))
            betak = dot2(zres, res_ref[:])
            # freeze ALL state once done: with a fixed trip count the
            # loop keeps executing after convergence, and an unfrozen
            # s <- zres + (betak/betakm1) s recurrence grows without
            # bound (then 0 * inf poisons dpsi with NaN)
            denom = jnp.where(jnp.abs(betakm1) > 0, betakm1, 1.0)
            s_new = zres + (betak / denom) * s_ref[:]
            s_ref[:] = jnp.where(done, s_ref[:], s_new)
            as_new = border(apply_op(s_ref[:]))
            as_ref[:] = jnp.where(done, as_ref[:], as_new)
            s_dot_as = dot2(s_ref[:], as_ref[:])
            safe = jnp.abs(s_dot_as) > jnp.abs(betak) * 1e-10
            alpha = jnp.where(safe,
                              betak / jnp.where(safe, s_dot_as, 1.0),
                              0.0) * live
            dpsi_out[:] = jnp.where(done, dpsi_out[:],
                                    dpsi_out[:] + alpha * s_ref[:])
            res_new = deflate(border(island_avg_dist(
                res_ref[:] - alpha * as_ref[:])))
            res_ref[:] = jnp.where(done, res_ref[:], res_new)
            k = iters + jnp.where(done, 0, 1)
            step = jnp.abs(alpha) * jnp.max(jnp.abs(s_ref[:]))
            step1 = jnp.where(done, step1, jnp.where(k == 1, step, step1))
            small = step < tol
            rate = jnp.where(
                (k > 1) & small,
                jnp.exp(jnp.log(jnp.maximum(step / step1, 1e-30))
                        / jnp.maximum(k - 1, 1)), 0.0)
            est_new = jnp.where(k == 1, step,
                                jnp.where(small,
                                          step * rate / (1.0 - rate), est))
            est = jnp.where(done, est, est_new)
            newly_done = jnp.where(k == 1, step < tol, small & (est < tol))
            done = done | newly_done | ~safe
            betakm1 = jnp.where(done, betakm1, betak)
            return (betakm1, step1, est, k, done)

        st = jax.lax.fori_loop(
            0, max_iter, body,
            (jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype),
             jnp.asarray(0.0, dtype), jnp.asarray(0, jnp.int32),
             trivially_done))
        dpsi_out[:] = deflate(dpsi_out[:])
        iters_out[0] = st[3]

    @jax.jit
    def solve(guess, forc, c2dtsf, tol):
        dtype = guess.dtype
        g_p = _pad_to(guess, jp, ip)
        f_p = _pad_to(forc, jp, ip)
        scal = jnp.stack([jnp.asarray(c2dtsf, dtype),
                          jnp.asarray(tol, dtype)])
        dpsi, iters = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((jp, ip), dtype),
                       jax.ShapeDtypeStruct((1,), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            scratch_shapes=[
                pltpu.VMEM((jp, ip), dtype),
                pltpu.VMEM((jp, ip), dtype),
                pltpu.VMEM((jp, ip), dtype),
                pltpu.VMEM((jp, ip), dtype),
            ],
            interpret=interpret,
        )(cf_flat.astype(dtype), z_p.astype(dtype), oh_p.astype(dtype),
          int_p.astype(dtype), pm_p.astype(dtype),
          rcounts.astype(dtype), g_p, f_p, scal)
        return dpsi[:jmt, :imt], iters[0]

    return solve
