"""earth_run.json builder integrity rules (VERDICT r4 #1: the r4
artifact silently interleaved two spinup branches)."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "scripts")

from make_earth_run_json import select_window  # noqa: E402


def _row(year, run_id="a", accel=1.0, sat=13.5):
    return dict(year=year, run_id=run_id, accel=accel, sat_gm=sat,
                sst_gm=19.0, toa_gm=0.1, ice_nh_min=8.0,
                ice_nh_max=17.0, ice_sh_min=0.1, ice_sh_max=25.0,
                psi_max=110.0, moc_max=80.0, moc_min=-90.0)


def test_rejects_gap():
    rows = [_row(y) for y in range(100, 130)] \
        + [_row(y) for y in range(140, 160)]
    with pytest.raises(SystemExit, match="not\\s+contiguous|missing"):
        select_window(rows, 40)


def test_rejects_accelerated():
    rows = [_row(y, accel=3.0 if y < 120 else 1.0)
            for y in range(100, 140)]
    with pytest.raises(SystemExit, match="accelerated"):
        select_window(rows, 30)
    # explicit override allowed
    assert len(select_window(rows, 30, allow_accel=True)) == 30


def test_last_write_wins_across_branches():
    """Overlapping restart branches: the NEWEST row logged for each
    year wins, and the window must still chain year by year."""
    old = [_row(y, run_id="old", sat=11.0) for y in range(100, 140)]
    new = [_row(y, run_id="new", sat=13.5) for y in range(120, 150)]
    win = select_window(old + new, 20)
    assert [r["year"] for r in win] == list(range(130, 150))
    assert all(r["run_id"] == "new" for r in win)


def test_drift_recomputable_from_emitted_series():
    rows = [_row(y, sat=13.5 + 0.001 * (y - 100))
            for y in range(100, 150)]
    win = select_window(rows, 50)
    years = np.array([r["year"] for r in win], float)
    sat = np.array([r["sat_gm"] for r in win])
    drift = np.polyfit(years, sat, 1)[0] * 10.0
    assert abs(drift - 0.01) < 1e-9
