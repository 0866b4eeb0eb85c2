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

    def border(ref_val):
        """cyclic wrap of the duplicated columns + zero boundary rows."""
        v = ref_val
        v = v.at[0, :].set(0.0).at[jmt - 1, :].set(0.0)
        if cyclic:
            v = v.at[:, 0].set(v[:, imt - 2])
            v = v.at[:, imt - 1].set(v[:, 1])
        else:
            v = v.at[:, 0].set(0.0).at[:, imt - 1].set(0.0)
        return v

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

        def island_sum_dist(x):
            if nisle == 0:
                return x
            sums = jnp.sum(oh_ref[:] * x[None], axis=(1, 2))
            rep = jnp.sum(oh_ref[:] * sums[:, None, None], axis=0)
            return jnp.where(pm > 0, rep, x)

        def island_avg_dist(x):
            if nisle == 0:
                return x
            sums = jnp.sum(oh_ref[:] * x[None], axis=(1, 2)) * rc_ref[:]
            rep = jnp.sum(oh_ref[:] * sums[:, None, None], axis=0)
            return jnp.where(pm > 0, rep, x)

        def dot2(a, b):
            return jnp.sum(a * b * intm)

        def inv_op(r):
            return border(island_sum_dist(zmat * r))

        dpsi0 = border(guess_ref[:])
        res0 = border((forc_ref[:] - apply_op(dpsi0)) * intm)
        zres0 = inv_op(res0)
        trivially_done = 100.0 * jnp.max(jnp.abs(zres0)) < tol

        def cond(st):
            return (~st[6]) & (st[5] < max_iter)

        def body(st):
            dpsi, res, s, betakm1, (step1, est), k, done = \
                st[0], st[1], st[2], st[3], st[4], st[5], st[6]
            k = k + 1
            zres = inv_op(res)
            betak = dot2(zres, res)
            s = zres + (betak / betakm1) * s
            a_s = border(apply_op(s))
            s_dot_as = dot2(s, a_s)
            safe = jnp.abs(s_dot_as) > jnp.abs(betak) * 1e-10
            alpha = jnp.where(safe,
                              betak / jnp.where(safe, s_dot_as, 1.0), 0.0)
            dpsi = dpsi + alpha * s
            res = border(island_avg_dist(res - alpha * a_s))
            step = jnp.abs(alpha) * jnp.max(jnp.abs(s))
            step1 = jnp.where(k == 1, step, step1)
            small = step < tol
            rate = jnp.where(
                (k > 1) & small,
                jnp.exp(jnp.log(jnp.maximum(step / step1, 1e-30))
                        / jnp.maximum(k - 1, 1)), 0.0)
            est = jnp.where(k == 1, step,
                            jnp.where(small, step * rate / (1.0 - rate),
                                      est))
            done = jnp.where(k == 1, step < tol, small & (est < tol))
            done = done | ~safe
            return (dpsi, res, s, betak, (step1, est), k, done)

        one = jnp.asarray(1.0, dpsi0.dtype)
        st = jax.lax.while_loop(
            cond, body,
            (dpsi0, res0, jnp.zeros_like(dpsi0), one,
             (jnp.asarray(0.0, dpsi0.dtype), jnp.asarray(0.0, dpsi0.dtype)),
             jnp.asarray(0, jnp.int32), trivially_done))
        dpsi_out[:] = st[0]
        iters_out[0] = st[5]

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
