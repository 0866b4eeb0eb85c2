"""High-latitude zonal filtering.

The reference stabilizes the converging meridians at high latitude by
filtering tracers, velocities and the barotropic forcing poleward of
~69 deg (tracer.F:980-993, clinic.F:480-493, tropic.F:136-141).  Two
implementations exist upstream: segment-wise Fourier truncation
(O_fourfil, filtr.F) and a masked finite-impulse-response smoother
(O_firfil, filfir.F).  The FIR variant maps directly onto TPU vector
units (a 3-point masked stencil applied N(j) times, no gather/scatter
segment machinery), so it is the implementation here; rows needing fewer
passes are masked out of later passes.

Filter parameters follow setcom.F:37-132: filtering starts poleward of
+-69.3 deg (and south of -87.3 deg nothing special happens - the rows
remain filtered), the pass count is refcos/cos(lat) with refcos at
67.5 deg, capped at imt/4; each "pass" applies the [.25,.5,.25] smoother
twice (filfir.F:50-97).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .stencil import E, W, setbcx

RJFRST = -87.3
RJFT0 = 67.5
RJFT1 = 69.3


def filter_passes(lat_deg: np.ndarray, imt: int,
                  rjft0=RJFT0, rjft1=RJFT1, rjfrst=RJFRST) -> np.ndarray:
    """Per-row pass counts (0 = unfiltered), setcom.F:101-132."""
    refcos = np.cos(np.deg2rad(rjft0))
    npass = np.maximum(1, (refcos / np.maximum(
        np.cos(np.deg2rad(lat_deg)), 1e-10)).astype(np.int64))
    numfmx = imt // 4
    npass = np.minimum(npass, numfmx)
    active = (np.abs(lat_deg) >= rjft1) & (lat_deg >= rjfrst)
    # rows south of rjfrst are boundary-adjacent; filter them too (they
    # are land in practice)
    return np.where(active, npass, 0)


def fir_filter(field, mask, npass_j, kind: str = "symmetric",
               cyclic: bool = True):
    """Apply the masked FIR smoother along x (filfir.F).

    field   : (..., jmt, imt)
    mask    : broadcastable {0,1} land mask (land must hold zeros)
    npass_j : (jmt,) int pass count per row (static numpy array)
    kind    : "symmetric" (tracers, conserving at land edges) or
              "asymmetric" (velocities)
    """
    npass_j = np.asarray(npass_j)
    max_pass = int(npass_j.max()) if npass_j.size else 0
    if max_pass == 0:
        return field
    active_rows = jnp.asarray(
        (npass_j[:, None] > np.arange(max_pass)[None, :]).astype(np.int8))

    def smooth(t):
        if kind == "symmetric":
            s = mask * (0.25 * (W(t) + E(t))
                        + t * (1.0 - 0.25 * (W(mask) + E(mask))))
        else:
            s = mask * (0.25 * W(t) + 0.5 * t + 0.25 * E(t))
        return setbcx(s, cyclic)

    out = field * mask
    for p in range(max_pass):
        row_on = active_rows[:, p].reshape(
            *([1] * (out.ndim - 2)), -1, 1).astype(out.dtype)
        sm = smooth(smooth(out))
        out = row_on * sm + (1.0 - row_on) * out
    # unfiltered (mask=0) points keep their original values
    return jnp.where(mask > 0, out, field)
