"""Configuration consistency checking (checks.F + UVic_ESCM.F chkcpl).

The reference validates ~100 CPP-option/namelist combinations at
startup (source/mom/checks.F:1-700, source/common/UVic_ESCM.F:418-733)
and either aborts (`errorc = .true.` -> stop) or adjusts-and-warns
(rounding output intervals to whole timesteps, matching mixing
parities).  Here the same contract: `validate(cfg)` raises
`ConfigError` for the fatal rules and returns a list of warning
strings for the adjust-and-warn ones.
"""

from __future__ import annotations

import math
from typing import List

from .config import ModelConfig


class ConfigError(ValueError):
    """A configuration the reference would refuse to start with."""


def validate(cfg: ModelConfig) -> List[str]:
    """Raise ConfigError on fatal inconsistencies; return warnings."""
    errors: List[str] = []
    warnings: List[str] = []
    o = cfg.ocean
    g = cfg.grid
    b = cfg.bgc

    # --- grid sanity (checks.F:40-52) --------------------------------
    if g.imt < 3:
        errors.append("imt must be >= 3 (checks.F:40)")
    if g.jmt < 4:
        errors.append("jmt must be >= 4 (checks.F:45)")
    if g.km < 1:
        errors.append("km must be >= 1")

    # --- timesteps (checks.F:407-425) ---------------------------------
    if o.dtsf <= 0:
        errors.append("external-mode timestep dtsf must be > 0 "
                      "(checks.F:407)")
    if o.dtuv <= 0:
        errors.append("internal-mode timestep dtuv must be > 0 "
                      "(checks.F:413)")
    if o.dtts <= 0:
        errors.append("tracer timestep dtts must be > 0 (checks.F:419)")
    if o.dtts > 0 and o.dtuv > 0 and o.dtts < o.dtuv:
        warnings.append("dtts < dtuv: tracer acceleration expects "
                        "dtts >= dtuv")

    # --- coupling cadence (chkcpl, UVic_ESCM.F:530-560) ---------------
    seg_s = cfg.time.segtim_days * 86400.0
    for name, dt in (("dtts", o.dtts), ("dtatm", cfg.embm.dtatm)):
        if dt > 0:
            ratio = seg_s / dt
            if abs(ratio - round(ratio)) > 1e-6:
                errors.append(
                    f"segment length ({cfg.time.segtim_days} days) is "
                    f"not a whole number of {name} steps "
                    f"(ratio {ratio:.4f}); the reference rounds the "
                    "segment — set segtim_days or the timestep so they "
                    "divide (chkcpl)")
    # even-fluxes parity rule (UVic_ESCM.F:557-566): the number of
    # steps per segment and the mixing interval must have the same
    # parity or leapfrog mixing drifts against the segment boundary
    if o.dtts > 0:
        nsteps = round(seg_s / o.dtts)
        if nsteps and o.nmix and (nsteps % 2) != 0 and o.nmix % 2 == 0:
            warnings.append(
                "odd ocean steps per segment with even nmix: mixing "
                "timesteps drift across segments (O_even_fluxes rule)")

    # --- solver (tropic) ----------------------------------------------
    if o.mxscan < 1:
        errors.append("mxscan must be >= 1")
    if o.tolrsf <= 0:
        errors.append("tolrsf must be > 0")

    # --- restoring BCs (checks.F:240-265, O_restorst) ------------------
    if getattr(o, "restorst", False):
        if o.dampts[0] <= 0 or o.dampts[1] <= 0:
            errors.append("dampts must be > 0 when restoring surface "
                          "tracers (checks.F:241)")
        if o.dampdz[0] <= 0 or o.dampdz[1] <= 0:
            errors.append("dampdz must be > 0 when restoring surface "
                          "tracers (checks.F:254)")
        if o.dampts[0] != o.dampts[1]:
            warnings.append("dampts differs between T and S "
                            "(checks.F:247 warning)")

    # --- advection scheme exclusivity (checks.F:55-80) ----------------
    if o.tracer_advection not in ("centered", "upstream", "quicker",
                                  "fct"):
        errors.append(f"unknown tracer_advection "
                      f"'{o.tracer_advection}'")

    # --- bgc option dependencies (mobi_init, mobi.F:140-175) -----------
    if b.nitrogen and not b.o2:
        errors.append("O_mobi_o2 must be on when nitrogen is used "
                      "(mobi.F:141-146)")
    if b.nitrogen_15 and not b.nitrogen:
        errors.append("nitrogen must be on when nitrogen_15 is used "
                      "(mobi.F:152-157)")
    if b.iron and not b.o2:
        errors.append("O_mobi_o2 must be on when iron is used "
                      "(mobi.F:168-172)")
    if b.caco3 and not b.carbon:
        errors.append("carbon must be on when caco3 is used "
                      "(mobi.F:222-227)")
    if b.carbon_13 and not b.carbon:
        errors.append("carbon must be on when carbon_13 is used")
    if b.carbon_14 and not b.carbon:
        errors.append("carbon must be on when carbon_14 is used")
    if b.pa_th and not b.caco3:
        errors.append("O_mobi_caco3 must be on when Pa/Th is used "
                      "(protac_thor.F:39-42)")
    if b.silicon and b.suite != "mobi":
        errors.append("silicon tracers require the mobi suite")
    if b.suite not in ("none", "npzd", "mobi"):
        errors.append(f"unknown bgc suite '{b.suite}'")
    if b.suite != "none" and b.dtnpzd <= 0:
        errors.append("dtnpzd must be > 0 with a bgc suite")

    # --- mixing schemes (checks.F:68-140 vmixset/hmixset) -------------
    if o.vmix not in ("const", "bryan_lewis", "ppmix"):
        errors.append(f"unknown vmix scheme '{o.vmix}'")
    if o.hmix not in ("const", "smagnl", "biharmonic"):
        errors.append(f"unknown hmix scheme '{o.hmix}'")
    if o.isopycmix and o.hmix == "biharmonic":
        warnings.append("isopycmix + biharmonic: the reference warns "
                        "this combination is untested (checks.F:288)")
    if getattr(o, "full_tensor", False) and not o.isopycmix:
        errors.append("O_full_tensor requires O_isopycmix "
                      "(isopyc.F:110-114)")

    # --- precision ------------------------------------------------------
    if cfg.dtype not in ("float32", "float64"):
        errors.append(f"dtype must be float32/float64, got {cfg.dtype}")

    if errors:
        raise ConfigError("configuration errors:\n  - "
                          + "\n  - ".join(errors))
    return warnings
