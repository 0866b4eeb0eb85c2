"""Transient forcing time series (CO2, solar, volcanic, sulphate, ...).

TPU-native re-design of the source/common/*data.F reader family
(co2data.F, c14data.F, solardata.F, volcdata.F, sulphdata.F,
sealevdata.F, ...) and the linear time interpolation they share
(timeinterp.F).  Each forcing is a TransientSeries: a (time, value)
table read from a NetCDF/CSV file when available (the reference's data
files are not shipped) or built from documented defaults, sampled by
linear interpolation at the model year.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class TransientSeries:
    """Piecewise-linear time series (timeinterp.F semantics: clamp at
    the ends, linear in between)."""
    times: np.ndarray     # years
    values: np.ndarray

    def at(self, year: float) -> float:
        return float(np.interp(year, self.times, self.values))

    @classmethod
    def from_netcdf(cls, path, time_var, value_var):
        from scipy.io import netcdf_file
        f = netcdf_file(path, "r", mmap=False)
        try:
            t = np.array(f.variables[time_var][:], dtype=float)
            v = np.array(f.variables[value_var][:], dtype=float)
        finally:
            f.close()
        return cls(times=t, values=v)

    @classmethod
    def from_csv(cls, path):
        data = np.loadtxt(path, delimiter=",", ndmin=2)
        return cls(times=data[:, 0], values=data[:, 1])

    @classmethod
    def constant(cls, value):
        return cls(times=np.array([0.0, 1.0]), values=np.array([value,
                                                                value]))


def co2_series(path=None) -> TransientSeries:
    """Atmospheric CO2 [ppmv] vs year (co2data.F). Default: a compact
    ice-core + Mauna Loa history (decadal anchor points)."""
    if path:
        return TransientSeries.from_csv(path)
    years = np.array([1000, 1750, 1800, 1850, 1900, 1930, 1950, 1970,
                      1990, 2000, 2010, 2020], dtype=float)
    ppm = np.array([280, 277, 283, 285, 296, 307, 311, 326, 354, 369,
                    389, 414], dtype=float)
    return TransientSeries(years, ppm)


def solar_series(path=None) -> TransientSeries:
    """Total solar irradiance [erg/cm^2/s] vs year (solardata.F).
    Default: constant modern value."""
    if path:
        return TransientSeries.from_csv(path)
    return TransientSeries.constant(1.368e6)


def volcanic_series(path=None) -> TransientSeries:
    """Volcanic radiative forcing reduction [erg/cm^2/s] (volcdata.F).
    Default: zero."""
    if path:
        return TransientSeries.from_csv(path)
    return TransientSeries.constant(0.0)


def c14_series(path=None) -> TransientSeries:
    """Atmospheric Delta-14C [permil] (c14data.F). Default: 0."""
    if path:
        return TransientSeries.from_csv(path)
    return TransientSeries.constant(0.0)


@dataclass
class TransientForcing:
    """The forcing bundle evaluated each segment (gasbc.F data calls)."""
    co2: TransientSeries
    solar: TransientSeries
    volcanic: TransientSeries
    c14: TransientSeries

    @classmethod
    def default(cls):
        return cls(co2=co2_series(), solar=solar_series(),
                   volcanic=volcanic_series(), c14=c14_series())

    def at(self, year: float) -> dict:
        return dict(
            co2ccn=self.co2.at(year),
            solarconst=self.solar.at(year) - self.volcanic.at(year),
            dc14ccn=self.c14.at(year),
        )
