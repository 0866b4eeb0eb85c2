"""Orbital geometry and top-of-atmosphere insolation.

TPU-native equivalent of source/embm/insolation.F (zenith/decl/orbit):
daily-mean insolation from declination and hour angle, with orbital
parameters for the modern epoch (Berger 1978 leading terms).  The
reference computes an annual mean by looping `zenith` over 365 days
(setembm.F:250-259); here both the daily-mean field and its annual mean
are closed forms.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import SOLARCONST


def orbital_params(year: float = 1950.0):
    """Modern orbital parameters (Berger-style; insolation.F `orbit`).
    Returns (eccentricity, obliquity [rad], lon of perihelion [rad])."""
    ecc = 0.016724
    obliq = np.deg2rad(23.446)
    per = np.deg2rad(102.04)
    return ecc, obliq, per


def declination_eccf(day_of_year, ecc=0.016724, obliq=np.deg2rad(23.446),
                     per=np.deg2rad(102.04), yrlen=365.0):
    """Solar declination [rad] and eccentricity factor (1/r^2) for a
    calendar day (0..yrlen), using the mean-anomaly expansion."""
    # mean longitude from vernal equinox (day ~80)
    lam_m = 2.0 * jnp.pi * (day_of_year - 80.0) / yrlen
    # equation of center (first order in eccentricity)
    nu = lam_m + 2.0 * ecc * jnp.sin(lam_m - per)
    sindec = jnp.sin(obliq) * jnp.sin(nu)
    dec = jnp.arcsin(sindec)
    eccf = (1.0 + ecc * jnp.cos(nu - per)) ** 2 / (1.0 - ecc ** 2) ** 2
    return dec, eccf


def daily_insolation(lat_rad, day_of_year, yrlen=365.0):
    """Daily-mean TOA insolation [erg/cm^2/s] at latitudes ``lat_rad``."""
    dec, eccf = declination_eccf(day_of_year, yrlen=yrlen)
    coshr = -jnp.tan(lat_rad) * jnp.tan(dec)
    h0 = jnp.arccos(jnp.clip(coshr, -1.0, 1.0))   # half daylength [rad]
    q = (SOLARCONST * eccf / jnp.pi) * (
        h0 * jnp.sin(lat_rad) * jnp.sin(dec)
        + jnp.cos(lat_rad) * jnp.cos(dec) * jnp.sin(h0))
    return jnp.maximum(q, 0.0)


def annual_mean_insolation(lat_rad, yrlen=365.0, ndays=365):
    """Annual-mean TOA insolation (setembm.F:250-259 equivalent)."""
    days = (jnp.arange(ndays) + 0.5).reshape(-1, *([1] * jnp.ndim(lat_rad)))
    q = daily_insolation(jnp.asarray(lat_rad)[None], days, yrlen)
    return q.mean(axis=0)
