"""Restart exactness, tsi/tavg, conservation audit, calendar tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.core.calendar import Alarm, Switches, TimeManager
from uvic_tpu.coupler.driver import CoupledModel
from uvic_tpu.diag.conservation import ConservationAudit
from uvic_tpu.diag.tsi import TsiDiagnostics
from uvic_tpu.io.netcdf import read_var, write_tavg
from uvic_tpu.io.restart import load_restart, save_restart
from uvic_tpu.io.tavg import TavgAccumulator, coupled_tavg_fields


@pytest.fixture(scope="module")
def coupled():
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e8))
    return CoupledModel(cfg)


def test_restart_exactness(coupled, tmp_path):
    """A split run must reproduce a continuous run bit-for-bit
    (SURVEY.md §4.5; the restart carries both leapfrog levels)."""
    m = coupled
    s = m.init_state()
    s = m.run(s, 2)
    save_restart(tmp_path / "rest.npz", s)
    s_cont = m.run(s, 2)
    s_loaded = load_restart(str(tmp_path / "rest.npz") , m.init_state())
    s_split = m.run(s_loaded, 2)
    for name in ("t", "u", "psi0", "ptd"):
        a = np.asarray(getattr(s_cont.ocean, name))
        b = np.asarray(getattr(s_split.ocean, name))
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(s_cont.atm.at),
                                  np.asarray(s_split.atm.at))
    np.testing.assert_array_equal(np.asarray(s_cont.ice.hice),
                                  np.asarray(s_split.ice.hice))


def test_tsi_and_conservation(coupled):
    m = coupled
    s = m.init_state()
    tsi = TsiDiagnostics(m.ocean, m.embm)
    audit = ConservationAudit(m.ocean)
    inv0 = audit.inventories(s.ocean)
    row = tsi.compute(s.ocean, s.atm, s.ice)
    assert 0 < row["o_tbar"] < 30
    assert 30 < row["o_sbar"] < 40
    s = m.run(s, 1)
    row2 = tsi.compute(s.ocean, s.atm, s.ice)
    assert np.isfinite(list(row2.values())).all()
    inv1 = audit.inventories(s.ocean)
    drift = audit.drift(inv0, inv1)
    # heat changes through surface fluxes but stays small over 5 days
    assert abs(drift["heat"]) < 1e-2


def test_tavg_and_netcdf(coupled, tmp_path):
    m = coupled
    s = m.init_state()
    acc = TavgAccumulator()
    acc.accumulate(coupled_tavg_fields(m, s))
    s = m.run(s, 1)
    acc.accumulate(coupled_tavg_fields(m, s))
    means = acc.normalize()
    assert acc.n == 0 and means["temp"].ndim == 3
    path = str(tmp_path / "tavg.nc")
    write_tavg(path, m.grid, means, time_days=5.0)
    back = read_var(path, "temp")
    np.testing.assert_allclose(back[0], means["temp"], rtol=1e-6)


def test_calendar():
    tm = TimeManager(eqyear=True)
    for _ in range(360 * 2):
        tm.increment(86400.0)
    y, mo, d, *_ = tm.date
    assert (y, mo, d) == (2, 1, 1)
    al = Alarm(10.0)
    fires = sum(al.check(d * 1.25, 1.25) for d in range(1, 65))
    assert fires == 8   # 80 model days / 10-day interval
