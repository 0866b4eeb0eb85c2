"""Minimal NetCDF output.

The reference funnels all prognostic I/O through a ~25-routine wrapper
over the netCDF library (source/netcdf/uvic_netcdf.f).  Here a thin
writer over scipy's NetCDF3 implementation (no external libnetcdf in
this environment) exports time-averaged fields and grids with CF-style
coordinates.
"""

from __future__ import annotations

import numpy as np
from scipy.io import netcdf_file


def write_tavg(path: str, grid, fields: dict, time_days: float,
               title: str = "uvic_tpu time averages"):
    """Write one time-average record. Fields may be 2-D (jmt, imt) or
    3-D (km, jmt, imt)."""
    f = netcdf_file(path, "w")
    try:
        f.title = title
        f.createDimension("longitude", grid.imt)
        f.createDimension("latitude", grid.jmt)
        f.createDimension("depth", grid.km)
        f.createDimension("time", 1)

        def coord(name, dim, data, units):
            v = f.createVariable(name, "d", (dim,))
            v[:] = np.asarray(data)
            v.units = units

        coord("longitude", "longitude", grid.xt, "degrees_east")
        coord("latitude", "latitude", grid.yt, "degrees_north")
        coord("depth", "depth", grid.zt / 100.0, "m")
        tv = f.createVariable("time", "d", ("time",))
        tv[:] = [time_days]
        tv.units = "days since 0000-01-01"

        for name, data in fields.items():
            data = np.asarray(data)
            if data.ndim == 2:
                v = f.createVariable(
                    name, "f", ("time", "latitude", "longitude"))
                v[0] = data.astype(np.float32)
            elif data.ndim == 3:
                v = f.createVariable(
                    name, "f", ("time", "depth", "latitude", "longitude"))
                v[0] = data.astype(np.float32)
    finally:
        f.close()


def read_var(path: str, name: str) -> np.ndarray:
    f = netcdf_file(path, "r", mmap=False)
    try:
        return np.array(f.variables[name][:])
    finally:
        f.close()
