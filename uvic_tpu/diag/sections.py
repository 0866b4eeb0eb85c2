"""Station, section and zonal-mean diagnostics.

TPU-native re-design of the reference's sampling diagnostics:

- XbtStations  : per-station column time series of T/S/u/v/w
  (source/mom/xbt.F:1-200 `xbt` stations, txbtxbt output) — stations
  are fixed (lon, lat) columns gathered from the state each call.
- cross_section: vertical slice of a 3-D field along a latitude or
  longitude line (source/mom/diag.F:216+ "matrix sections" output).
- zonal_mean_sbc: zonal means of the surface boundary fields
  (source/mom/diag.F zonal-mean SBC block; embm_tsi zonal rows).

All samplers are cheap gathers; they jit and can run every tsi
interval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class XbtStations:
    """Fixed measurement columns (xbt.F station list)."""

    #: default station set: named basins of the reference xbt output
    DEFAULT = (
        ("n_atlantic", 330.0, 30.0),
        ("eq_atlantic", 335.0, 0.0),
        ("s_atlantic", 345.0, -30.0),
        ("n_pacific", 180.0, 40.0),
        ("eq_pacific", 220.0, 0.0),
        ("s_pacific", 220.0, -30.0),
        ("indian", 80.0, -10.0),
        ("southern", 200.0, -60.0),
        ("arctic", 0.0, 80.0),
    )

    def __init__(self, grid, stations=None):
        stations = stations or self.DEFAULT
        lon = np.asarray(grid.xt) % 360.0
        lat = np.asarray(grid.yt)
        self.names, jj, ii = [], [], []
        for name, slon, slat in stations:
            self.names.append(name)
            ii.append(int(np.argmin(np.abs(lon - (slon % 360.0)))))
            jj.append(int(np.argmin(np.abs(lat - slat))))
        self.jj = jnp.asarray(jj)
        self.ii = jnp.asarray(ii)

    def sample(self, ocean_state, ocean_model) -> dict:
        """dict name -> dict(temp/salt/u/v: (km,) column)."""
        t = ocean_state.t
        uf = ocean_model.full_velocity(ocean_state.u, ocean_state.psi0)
        cols = dict(
            temp=t[0][:, self.jj, self.ii],
            salt=t[1][:, self.jj, self.ii] * 1000.0 + 35.0,
            u=uf[0][:, self.jj, self.ii],
            v=uf[1][:, self.jj, self.ii],
        )
        out = {}
        for n, name in enumerate(self.names):
            out[name] = {k: np.asarray(v[:, n]) for k, v in cols.items()}
        return out


def cross_section(field, grid, lat=None, lon=None):
    """Vertical section of a (km, jmt, imt) field along a fixed
    latitude (returns (km, imt)) or longitude (returns (km, jmt))."""
    if (lat is None) == (lon is None):
        raise ValueError("specify exactly one of lat=, lon=")
    if lat is not None:
        j = int(np.argmin(np.abs(np.asarray(grid.yt) - lat)))
        return np.asarray(field[:, j, :])
    i = int(np.argmin(np.abs((np.asarray(grid.xt) % 360.0)
                             - (lon % 360.0))))
    return np.asarray(field[:, :, i])


def zonal_mean_sbc(fields: dict, tmask_surf, dxt) -> dict:
    """Zonal means over ocean cells of surface boundary fields
    (diag.F zonal-mean SBC): fields maps name -> (jmt, imt)."""
    w = tmask_surf * jnp.asarray(np.asarray(dxt))[None, :]
    w = w.at[:, 0].set(0.0).at[:, -1].set(0.0)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-30)
    return {k: np.asarray(jnp.sum(v * w, axis=1) / wsum)
            for k, v in fields.items()}
