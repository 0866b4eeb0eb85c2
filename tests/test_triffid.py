"""TRIFFID dynamic-vegetation tests (triffid.F / lotka.F / COMPETE).

The competition update is the dominance-ordered sequential solve of
COMPETE (lotka.F:275-400): trees (taller first) > shrub > grasses
(taller first), each rank clipped to [FRAC_MIN, remaining space] and
consuming the space left to lower ranks.
"""

import jax.numpy as jnp
import numpy as np

from uvic_tpu.models.land.mtlm import (FRAC_MIN, NPFT, LandState,
                                       init_land_state, triffid_update)


def _state(jmt=4, imt=4, frac=None, ht=None):
    lmask = np.ones((jmt, imt))
    st = init_land_state(jmt, imt, lmask, np.float64)
    if frac is not None:
        f = np.zeros((NPFT + 1, jmt, imt))
        f[:NPFT] = np.asarray(frac)[:, None, None]
        f[NPFT] = 1.0 - f[:NPFT].sum(0)
        st = st.replace(frac=jnp.asarray(f))
    if ht is not None:
        st = st.replace(ht=jnp.asarray(
            np.broadcast_to(np.asarray(ht)[:, None, None],
                            (NPFT, jmt, imt))).astype(jnp.float64))
    return st, jnp.asarray(lmask)


def _grow(st, lmask, npp_rate, years=30, gamma=1.0):
    for _ in range(years):
        st = st.replace(
            npp_acc=jnp.asarray(np.broadcast_to(
                np.asarray(npp_rate)[:, None, None],
                st.npp_acc.shape)),
            nacc=jnp.ones((), jnp.int32))
        st, diag = triffid_update(st, lmask, gamma)
    return st


def test_fractions_bounded_and_partition():
    """After many updates: every PFT >= FRAC_MIN, total cover + soil
    partitions the vegetated area."""
    st, lmask = _state()
    st = _grow(st, lmask, npp_rate=[0.8, 0.5, 0.6, 0.4, 0.3])
    f = np.asarray(st.frac)
    assert (f[:NPFT] >= FRAC_MIN - 1e-12).all()
    assert f[:NPFT].sum(0).max() <= 1.0 + 1e-9
    assert f[NPFT].min() >= -1e-12           # soil residual, no floor
    total = f.sum(0)
    np.testing.assert_allclose(total, 1.0, atol=1e-6)


def test_dominant_tree_outcompetes():
    """With equal NPP, the taller tree (pre-seeded higher) claims the
    canopy: competition is resolved through the height hierarchy, not
    symmetrically."""
    st, lmask = _state(frac=[0.3, 0.3, 0.1, 0.1, 0.1],
                       ht=[12.0, 4.0, 0.8, 0.8, 2.0])
    st = _grow(st, lmask, npp_rate=[0.9, 0.9, 0.3, 0.3, 0.3], years=60)
    f = np.asarray(st.frac)
    assert f[0].mean() > f[1].mean() + 0.05   # BT beats NT


def test_grass_fills_space_without_trees():
    """Negative tree/shrub NPP: the grasses take the space (trees and
    shrub decay toward FRAC_MIN; shrub outranks grass in the
    hierarchy, so it must actually lose carbon to release the
    space)."""
    st, lmask = _state()
    st = _grow(st, lmask, npp_rate=[-0.5, -0.5, 0.9, 0.6, -0.3],
               years=80)
    f = np.asarray(st.frac)
    assert f[0].mean() < 0.05 and f[1].mean() < 0.05
    assert f[4].mean() < 0.1                  # shrub decays
    assert f[2].mean() > 0.3                  # C3 grass dominates
    assert f[2].mean() > f[3].mean()          # taller C3 beats C4
