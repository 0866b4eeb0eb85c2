"""Vertical tridiagonal solve (implicit vertical diffusion).

TPU-native equivalent of source/mom/invtri.F: the Thomas algorithm
vectorized over all columns at once.  The k recursion runs as a
`lax.scan` over the (short, km<=19) vertical axis while every (j,i)
column solves in parallel on the VPU — the same structure the reference
gets by vectorizing over i (invtri.F:85-110), scaled to the whole domain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_tridiag_masked(a, b, c, f, mask, eps=1.0e-30):
    """Solve the masked tridiagonal systems a*z[k-1] + b*z[k] + c*z[k+1] = f.

    All inputs are (km, ...) with per-column land masking: masked levels
    produce 0 (invtri.F multiplies the decomposition by mask with an eps
    regularizer so land columns stay finite).
    """
    km = a.shape[0]

    def fwd(carry, xs):
        bet_prev, z_prev = carry
        ak, bk, ck_prev, fk, mk = xs
        e = ck_prev * bet_prev
        bet = mk / (bk - ak * e + eps)
        z = (fk - ak * z_prev) * bet
        return (bet, z), (e, z)

    c_prev = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    bet0 = mask[0] / (b[0] + eps)
    z0 = f[0] * bet0
    (_, _), (e, z) = jax.lax.scan(
        fwd, (bet0, z0),
        (a[1:], b[1:], c_prev[1:], f[1:], mask[1:]))
    e = jnp.concatenate([jnp.zeros_like(e[:1]), e], axis=0)
    z = jnp.concatenate([z0[None], z], axis=0)

    def bwd(z_next, xs):
        zk, ek_next = xs
        z = zk - ek_next * z_next
        return z, z

    e_next = jnp.concatenate([e[1:], jnp.zeros_like(e[:1])], axis=0)
    _, z_rev = jax.lax.scan(bwd, z[-1], (z[:-1][::-1], e_next[:-1][::-1]))
    return jnp.concatenate([z_rev[::-1], z[-1:]], axis=0)


def invtri(z, topbc, botbc, dcb, tdt, kmz, mask, grid_dztr, grid_dztur,
           grid_dztlr, aidif):
    """Implicit vertical diffusion update (invtri.F:1-115).

    z      : (km, jmt, imt) right-hand side (tracer or velocity at tau+1)
    topbc  : (jmt, imt) surface flux b.c.
    botbc  : (jmt, imt) bottom flux b.c.
    dcb    : (km, jmt, imt) mixing coefficient at cell bottoms
    tdt    : (km,) effective 2*dt per level (includes dtxcel acceleration)
    kmz    : (jmt, imt) int level count (kmt or kmu)
    mask   : (km, jmt, imt) land mask
    returns: (km, jmt, imt) solution
    """
    km = z.shape[0]
    tdt = tdt.reshape(km, 1, 1)
    factu = grid_dztur.reshape(km, 1, 1) * tdt * aidif
    factl = grid_dztlr.reshape(km, 1, 1) * tdt * aidif

    dcb_up = jnp.concatenate([dcb[:1], dcb[:-1]], axis=0)  # dcb[k-1], k=0->0
    mask_dn = jnp.concatenate([mask[1:], mask[-1:]], axis=0)
    a = -dcb_up * factu * mask
    c = -dcb * factl * mask_dn
    a = a.at[0].set(0.0)
    c = c.at[-1].set(0.0)
    b = 1.0 - a - c
    f = z * mask

    # top flux enters level 0; bottom flux leaves level kb-1
    dztr = grid_dztr.reshape(km, 1, 1)
    f = f.at[0].add(topbc * tdt[0] * dztr[0] * aidif * mask[0])
    kb = jnp.maximum(kmz - 1, 1)  # invtri.F:79 max(2,kmz), 0-based
    levels = jnp.arange(km).reshape(km, 1, 1)
    is_bot = levels == kb[None]
    f = f - jnp.where(is_bot, botbc[None] * tdt * dztr * aidif * mask, 0.0)

    return solve_tridiag_masked(a, b, c, f, mask)
