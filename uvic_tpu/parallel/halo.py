"""Explicit halo exchange for shard_map domain decomposition.

The GSPMD path (`parallel/mesh.py`) lets XLA insert one
collective-permute per stencil shift — dozens per ocean step.  This
module implements the aggregated alternative (SURVEY.md §7.2-8): all
fields that feed the step's stencil cascade are packed into ONE array,
exchanged ONCE per step with a halo wide enough to cover the full
stencil composition depth, and the unchanged whole-domain kernels then
run on the halo-padded local block.  Shard-edge cells within the halo
compute garbage (rolls wrap local data) and are cropped; everything a
kept cell reads is valid because the halo width exceeds the stencil
depth.  Two ppermute pairs (x ring, y line) per step replace the
per-shift collectives, and XLA can overlap them with the column-local
work (EOS, sources, convection) that needs no halos.

Grid conventions (core/grid.py): arrays carry duplicated zonal ghost
columns (col 0 = col imt-2, col imt-1 = col 1), so the true zonal
period is imt-2.  Static per-cell constants (grid factors, masks, kmt,
operator coefficients) are *extended* host-side with that periodicity
in x and edge-clamp/zero fill in y, then each shard dynamic-slices its
padded local view at trace time — no runtime exchange for constants.

The meridional boundary rows are solid walls: y halos beyond the walls
are zero-filled, which matches the global computation because every
reference stencil masks those rows (fields are zero on land).
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# classification of the per-cell constant arrays in the kernel
# parameter bag (model.py `bag`): which trailing axes are spatial
# 'x'  : last axis is imt      'y'  : last axis is jmt
# 'yx' : trailing axes (jmt, imt)    'k'/'scalar': replicated
BAG_AXES = {
    "dxt": "x", "dxu": "x", "dxtr": "x", "dxt2r": "x", "dxt4r": "x",
    "dxu2r": "x", "dxu4r": "x", "dxur": "x", "dxmetr": "x",
    "duw": "x", "due": "x",
    "dyt": "y", "dyu": "y", "cst": "y", "csu": "y", "dytr": "y",
    "dyt2r": "y", "dyu2r": "y", "dyu4r": "y", "dyur": "y",
    "cstr": "y", "csur": "y", "dus": "y", "dun": "y",
    "cstdyt2r": "y", "csudyu2r": "y",
    "advmet": "y", "amc_north": "y", "amc_south": "y",
    "ahc_north": "y", "ahc_south": "y", "am3": "y", "am4": "y",
    "cstdxt2r": "yx", "cstdxtr": "yx", "cstdxur": "yx",
    "csudxur": "yx", "csudxu2r": "yx", "hr": "yx", "h": "yx",
    "cori": "yx",
    "dzt": "k", "dzw": "k", "dzt2r": "k", "dztr": "k", "dzwr": "k",
    "dztur": "k", "dztlr": "k", "dtxcel": "k",
    "ah": "scalar", "am": "scalar", "grav_rho0r": "scalar",
    "quicker": "skip",
}


# ----------------------------------------------------------------------
# host-side extension of static constants
#
# The window may be PADDED beyond the reference layout to make the
# grid divisible by the mesh: window position g (0-based) holds the
# periodic image of real column ((g - 1) mod m) + 1 with m = imt - 2
# (positions 0 and imt-1 reproduce the standard duplicated ghost
# columns; positions >= imt are extra images).  Rows beyond jmt - 1
# are "beyond the wall": clamp (grid factors) or zero (masked fields).

def extend_x(a: np.ndarray, w: int, axis: int = -1,
             n_out: int | None = None) -> np.ndarray:
    """Periodic window extension: output position p in [0, n) keeps the
    stored column (incl. the duplicated ghosts); outside, p maps to the
    periodic image ((p - 1) mod (n - 2)) + 1."""
    a = np.asarray(a)
    n = a.shape[axis]
    n_out = n if n_out is None else n_out
    p = np.arange(-w, n_out + w)
    idx = np.where((p >= 0) & (p < n), p, ((p - 1) % (n - 2)) + 1)
    return np.take(a, idx, axis=axis)


def extend_y(a: np.ndarray, w: int, axis: int = -1,
             fill: str = "clamp", n_out: int | None = None) -> np.ndarray:
    """Extend beyond the wall rows: 'clamp' repeats the edge value
    (grid factors — finite, multiplied by zero-masked data), 'zero'
    pads zeros (masks and physical fields)."""
    a = np.asarray(a)
    n = a.shape[axis]
    n_out = n if n_out is None else n_out
    gi = np.arange(-w, n_out + w)
    if fill == "clamp":
        return np.take(a, np.clip(gi, 0, n - 1), axis=axis)
    out = np.take(a, np.clip(gi, 0, n - 1), axis=axis)
    mask_shape = [1] * a.ndim
    mask_shape[axis] = len(gi)
    valid = ((gi >= 0) & (gi < n)).reshape(mask_shape)
    return np.where(valid, out, np.zeros_like(out))


def extend_yx(a: np.ndarray, w: int, fill: str = "clamp",
              jmt_p: int | None = None,
              imt_p: int | None = None) -> np.ndarray:
    """Extend trailing (jmt, imt) axes: x periodic, y clamp/zero."""
    return extend_y(extend_x(a, w, axis=-1, n_out=imt_p), w, axis=-2,
                    fill=fill, n_out=jmt_p)


# ----------------------------------------------------------------------
# trace-time local views of extended constants

def _dslice(a, start, size, axis):
    zero = jnp.zeros((), jnp.int32)
    idx = [zero] * a.ndim
    sizes = list(a.shape)
    idx[axis] = jnp.asarray(start, jnp.int32)
    sizes[axis] = size
    return jax.lax.dynamic_slice(a, tuple(idx), tuple(sizes))


class ExtendedStatics:
    """Host-extends a dict of named constants once; produces per-shard
    padded local views inside shard_map given the shard indices.

    jmt_p/imt_p: PADDED window sizes (multiples of ny/nx); positions
    beyond the reference layout carry periodic x images / beyond-wall
    y fill, so any grid shards on any mesh."""

    def __init__(self, arrays: dict, axes: dict, jmt: int, imt: int,
                 ny: int, nx: int, w: int, fills: dict | None = None,
                 dtype=None, jmt_p: int | None = None,
                 imt_p: int | None = None):
        jmt_p = jmt if jmt_p is None else jmt_p
        imt_p = imt if imt_p is None else imt_p
        assert jmt_p % ny == 0 and imt_p % nx == 0, \
            f"padded grid {jmt_p}x{imt_p} not divisible by mesh {ny}x{nx}"
        self.ly, self.lx = jmt_p // ny, imt_p // nx
        self.w = w
        self.axes = axes
        fills = fills or {}
        self.ext = {}
        for name, a in arrays.items():
            kind = axes[name]
            if kind in ("k", "scalar", "skip") or a is None:
                self.ext[name] = a
                continue
            a = np.asarray(a)
            fill = fills.get(name, "clamp")
            if kind == "x":
                e = extend_x(a, w, axis=-1, n_out=imt_p)
            elif kind == "y":
                e = extend_y(a, w, axis=-1, fill=fill, n_out=jmt_p)
            else:
                e = extend_yx(a, w, fill=fill, jmt_p=jmt_p, imt_p=imt_p)
            self.ext[name] = jnp.asarray(
                e.astype(dtype) if (dtype is not None
                                    and np.issubdtype(e.dtype,
                                                      np.floating))
                else e)

    def local(self, name: str, iy, ix):
        """Padded local view (size l+2w on each sharded axis)."""
        a = self.ext[name]
        kind = self.axes[name]
        if kind in ("k", "scalar", "skip") or a is None:
            return a
        if kind == "x":
            return _dslice(a, ix * self.lx, self.lx + 2 * self.w, -1 % a.ndim)
        if kind == "y":
            return _dslice(a, iy * self.ly, self.ly + 2 * self.w, -1 % a.ndim)
        a = _dslice(a, ix * self.lx, self.lx + 2 * self.w, a.ndim - 1)
        return _dslice(a, iy * self.ly, self.ly + 2 * self.w, a.ndim - 2)

    def bag(self, iy, ix) -> SimpleNamespace:
        return SimpleNamespace(
            **{k: self.local(k, iy, ix) for k in self.ext})


# ----------------------------------------------------------------------
# runtime halo exchange (inside shard_map)

def exchange_pad(f, w: int, yname: str, xname: str, ny: int, nx: int,
                 gx: int = 2):
    """Pad a local block (..., ly, lx) to (..., ly+2w, lx+2w) with
    neighbor data: one ppermute pair along the cyclic x ring (honoring
    the duplicated ghost columns) and one along the walled y line.
    Corners are correct because the y exchange runs on the x-padded
    array.

    gx: trailing ghost/image column count of the global window — 2 for
    the standard layout, 2 + pad when the window is padded to make imt
    divisible by nx (window position g holds real ((g-1) mod m) + 1,
    m = true zonal period)."""
    # --- x ring: the true zonal period excludes the gx trailing image
    # columns (and 1 leading ghost), so the first/last shards send
    # their *real* periodic-continuation columns
    ix = jax.lax.axis_index(xname)
    is_first = ix == 0
    is_last = ix == nx - 1
    lx = f.shape[-1]
    send_e = jnp.where(is_last, f[..., lx - gx - w:lx - gx],
                       f[..., lx - w:])
    send_w = jnp.where(is_first, f[..., gx:gx + w], f[..., :w])
    fwd = [(i, (i + 1) % nx) for i in range(nx)]
    bwd = [(i, (i - 1) % nx) for i in range(nx)]
    wh = jax.lax.ppermute(send_e, xname, fwd)   # from west neighbor
    eh = jax.lax.ppermute(send_w, xname, bwd)   # from east neighbor
    f = jnp.concatenate([wh, f, eh], axis=-1)

    # --- y line: shards at the walls receive zeros (ppermute default
    # for unmatched targets), matching the masked wall rows
    ly = f.shape[-2]
    up = [(i, i + 1) for i in range(ny - 1)]
    dn = [(i + 1, i) for i in range(ny - 1)]
    sh = jax.lax.ppermute(f[..., ly - w:, :], yname, up)  # from south
    nh = jax.lax.ppermute(f[..., :w, :], yname, dn)       # from north
    return jnp.concatenate([sh, f, nh], axis=-2)


def crop(f, w: int):
    """Drop the halo frame."""
    return f[..., w:f.shape[-2] - w, w:f.shape[-1] - w]


def pad_zeros(f, w: int):
    """Shape-match a field that needs no neighbor data (pointwise use
    only, e.g. surface fluxes, bgc sources)."""
    pw = [(0, 0)] * (f.ndim - 2) + [(w, w), (w, w)]
    return jnp.pad(f, pw)


# ----------------------------------------------------------------------
# device-side window padding (divisibility lift): state fields are
# padded each step from (jmt, imt) to (jmt_p, imt_p) — x pad columns
# gather the correct periodic images from REAL columns, y pad rows are
# zeros (beyond the wall, always masked) — and cropped back after.

def pad_window(f, jmt_p: int, imt_p: int):
    jmt, imt = f.shape[-2:]
    m = imt - 2
    if imt_p > imt:
        idx = jnp.asarray([((g - 1) % m) + 1 for g in range(imt, imt_p)],
                          dtype=jnp.int32)
        f = jnp.concatenate([f, jnp.take(f, idx, axis=-1)], axis=-1)
    if jmt_p > jmt:
        pw = [(0, 0)] * (f.ndim - 2) + [(0, jmt_p - jmt), (0, 0)]
        f = jnp.pad(f, pw)
    return f


def crop_window(f, jmt: int, imt: int):
    return f[..., :jmt, :imt]


def pack_exchange(fields: list, w: int, yname: str, xname: str,
                  ny: int, nx: int, gx: int = 2) -> list:
    """Halo-pad a list of (..., ly, lx) arrays with ONE exchange:
    flatten leading dims, concatenate, exchange, split back."""
    ly, lx = fields[0].shape[-2:]
    dtype = fields[0].dtype
    flat, meta = [], []
    for f in fields:
        lead = f.shape[:-2]
        n = int(np.prod(lead)) if lead else 1
        flat.append(f.astype(dtype).reshape((n, ly, lx)))
        meta.append((lead, n, f.dtype))
    packed = jnp.concatenate(flat, axis=0)
    padded = exchange_pad(packed, w, yname, xname, ny, nx, gx=gx)
    outs, off = [], 0
    for lead, n, dt in meta:
        blk = padded[off:off + n].astype(dt)
        outs.append(blk.reshape(lead + blk.shape[-2:]))
        off += n
    return outs
