"""River routing: land runoff to ocean discharge points.

TPU-native re-design of source/embm/rivmodel.F: the reference reads
basin maps from a data file (absent upstream) and sums basin runoff
into mouth cells.  Here basins are generated at init by a breadth-first
"flow to nearest coast" labeling (each land cell drains to the closest
ocean cell, cyclic in x), which reproduces the reference architecture
(precomputed integer routing map + segment-sum discharge) with a
synthetic geography.

Runtime routing is one scatter-add: discharge[mouth] += runoff[land].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from collections import deque


def build_routing(kmt: np.ndarray, cyclic: bool = True) -> np.ndarray:
    """Flat index of the ocean cell each land cell drains to; ocean and
    boundary cells map to themselves."""
    jmt, imt = kmt.shape
    ocean = kmt > 0
    target = np.full((jmt, imt), -1, dtype=np.int64)
    q = deque()
    jj, ii = np.where(ocean)
    for j, i in zip(jj, ii):
        target[j, i] = j * imt + i
        q.append((j, i))
    while q:
        j, i = q.popleft()
        for dj, di in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            j2 = j + dj
            i2 = i + di
            if not (0 <= j2 < jmt):
                continue
            if cyclic:
                if i2 == 0:
                    i2 = imt - 2
                elif i2 == imt - 1:
                    i2 = 1
            if not (0 <= i2 < imt):
                continue
            if target[j2, i2] < 0:
                target[j2, i2] = target[j, i]
                q.append((j2, i2))
    # isolated cells (shouldn't happen) drain in place
    unset = target < 0
    flat = np.arange(jmt * imt).reshape(jmt, imt)
    target[unset] = flat[unset]
    return target


class RiverModel:
    def __init__(self, kmt: np.ndarray, area2d, cyclic: bool = True):
        self.target = jnp.asarray(build_routing(np.asarray(kmt), cyclic))
        self.area = jnp.asarray(area2d)       # T-cell areas (jmt, imt)
        self.shape = kmt.shape

    def discharge(self, runoff):
        """Route land runoff [g/cm^2/s] to ocean discharge [g/cm^2/s]
        (area-conserving scatter-add, rivmodel.F `rivmodel`)."""
        mass = (runoff * self.area).ravel()
        out = jnp.zeros(mass.shape, mass.dtype).at[self.target.ravel()] \
            .add(mass)
        return out.reshape(self.shape) / (self.area + 1e-30)
