"""Ocean sediment model: CaCO3 / organic-carbon diagenesis columns.

TPU-native re-design of source/sed/ (sed.F driver + sediment.F Archer
1996-style diagenesis).  The reference solves pore-water CO3 profiles
per sediment column with a banded LU (sediment.F my_sgbfa/my_sgbsl) over
an irregular ipmax column list; here every ocean-bottom cell carries a
sediment column as dense masked fields and the pore-water CO3 balance
collapses to the interfacial dissolution closure

    dissolution = k_diss * fCaCO3 * max(0, 1 - CO3_bw/CO3_sat)^n

(the Keir/Archer rate law the reference's profile solve approximates at
the interface), with organic-carbon rain respiration, calcite burial
into a mixed layer of fixed thickness, and the coupler fluxes the
reference exchanges (rain in via sbc irorg/ircal, dissolved return via
ibdicfx/ibalkfx, weathering/burial bookkeeping).  The full pore-water
profile solver is future work; the architecture (per-dtsed cadence,
state layout, flux bus slots, conservation) matches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class SedState:
    caco3: jnp.ndarray     # (jmt, imt) mixed-layer CaCO3 [umol/cm^2]
    orgc: jnp.ndarray      # organic carbon [umol/cm^2]
    buried: jnp.ndarray    # cumulative burial [umol/cm^2]
    rain_cal: jnp.ndarray  # accumulated calcite rain [umol/cm^2]
    rain_org: jnp.ndarray  # accumulated organic rain [umol/cm^2]


def init_sed_state(jmt, imt, dtype):
    z = jnp.zeros((jmt, imt), dtype)
    return SedState(caco3=z + 100.0, orgc=z + 10.0, buried=z,
                    rain_cal=z, rain_org=z)


KDISS = 0.2 / 86400.0     # dissolution rate constant [1/s]
NDISS = 4.5               # Keir rate-law exponent
KORG = 0.05 / 86400.0     # organic respiration rate [1/s]
MIXED_CAP = 2500.0        # mixed-layer capacity [umol/cm^2]


def co3_saturation(depth_cm):
    """Calcite saturation CO3 [mol/m^3] vs depth (lysocline shape)."""
    return 0.0423 * jnp.exp(depth_cm / 100.0 / 3890.0) * 1.0e-3 * 2.465


def sed_step(state: SedState, co3_bw, depth_cm, ocean_mask, dtsed):
    """One sediment step (sed.F:2-313 cadence).

    co3_bw : bottom-water carbonate ion [mol/m^3]
    Returns (new_state, fluxes) with dic/alk fluxes to the bottom water
    [umol/cm^2/s] (positive into the ocean).
    """
    co3sat = co3_saturation(depth_cm)
    undersat = jnp.maximum(0.0, 1.0 - co3_bw / co3sat)
    # add rain accumulated since the last sed step
    caco3 = state.caco3 + state.rain_cal
    orgc = state.orgc + state.rain_org

    diss = KDISS * caco3 * undersat ** NDISS
    resp = KORG * orgc
    caco3 = jnp.maximum(caco3 - dtsed * diss, 0.0)
    orgc = jnp.maximum(orgc - dtsed * resp, 0.0)

    # burial: the mixed layer has finite capacity; excess CaCO3 buries
    excess = jnp.maximum(caco3 - MIXED_CAP, 0.0)
    caco3 = caco3 - excess
    buried = state.buried + excess

    z = jnp.zeros_like(co3_bw)
    new = SedState(
        caco3=jnp.where(ocean_mask > 0, caco3, state.caco3),
        orgc=jnp.where(ocean_mask > 0, orgc, state.orgc),
        buried=jnp.where(ocean_mask > 0, buried, state.buried),
        rain_cal=z, rain_org=z)
    fluxes = dict(
        dic=(diss + resp) * ocean_mask,        # [umol/cm^2/s]
        alk=2.0 * diss * ocean_mask,
        burial=excess / jnp.maximum(dtsed, 1.0) * ocean_mask,
    )
    return new, fluxes


def add_rain(state: SedState, rain_cal, rain_org):
    """Accumulate particle rain between sed steps (the sbc irorg/ircal
    accumulation, tracer.F:387-391,505-510)."""
    return state.replace(rain_cal=state.rain_cal + rain_cal,
                         rain_org=state.rain_org + rain_org)
