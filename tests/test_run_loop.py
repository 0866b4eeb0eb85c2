"""Production run loop tests (coupler/run.py): alarm-cadenced outputs,
restart split==continuous tsi stream (mom_rest.F contract), and the
tropic.F nconv>50 abort semantics."""

import dataclasses
import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.coupler.driver import CoupledModel
from uvic_tpu.coupler.run import Run


def _model(tsiint=5.0, timavgint=20.0, restint=20.0):
    cfg = small_config()
    # tolrsf is loose here: a cold start's first barotropic solves are
    # legitimately slow to converge (the reference merely warns), and
    # these tests exercise the run loop, not solver accuracy
    cfg = cfg.replace(
        ocean=dataclasses.replace(
            cfg.ocean, isopycmix=False, gent_mcwilliams=False,
            dtts=43200.0, dtuv=1800.0, dtsf=1800.0, tolrsf=1e11),
        time=dataclasses.replace(
            cfg.time, tsiint=tsiint, timavgint=timavgint, restint=restint))
    return CoupledModel(cfg)


def test_run_emits_tsi_tavg_restart(tmp_path):
    m = _model()
    run = Run(m, str(tmp_path))
    state = m.init_state()
    state = run.run(state, days=20.0)        # 4 segments
    # tsi stream: 20 days / tsiint 5 = 4 rows
    lines = open(tmp_path / "tsi.csv").read().strip().splitlines()
    assert len(lines) == 1 + 4               # header + rows
    assert "o_tbar" in lines[0] and "nconv" in lines[0]
    # tavg written at day 20
    assert glob.glob(str(tmp_path / "tavg*.nc"))
    # records append along the UNLIMITED time dimension (one stream
    # file per run, round-5 netcdf.py)
    from uvic_tpu.io.netcdf import read_var
    tavg_files = glob.glob(str(tmp_path / "tavg*.nc"))
    trec = read_var(tavg_files[0], "time")
    assert trec.ndim == 1 and len(trec) >= 1
    # restart written (restint and end of run)
    assert (tmp_path / "restart.npz").exists()
    assert (tmp_path / "run_summary.json").exists()
    vals = np.array([float(x) for x in lines[1].split(",")[1:]])
    assert np.isfinite(vals).all()


def test_split_run_reproduces_continuous_tsi(tmp_path):
    """A run restarted at day 20 must produce the same tsi rows as the
    continuous run (restart carries both leapfrog levels, SURVEY §3.5)."""
    # continuous 40 days
    m1 = _model()
    run1 = Run(m1, str(tmp_path / "cont"))
    s1 = run1.run(m1.init_state(), days=40.0)

    # split: 20 days, save, new Run loads and continues 20 days
    m2 = _model()
    run2 = Run(m2, str(tmp_path / "split"))
    s2 = run2.run(m2.init_state(), days=20.0)
    m3 = _model()
    run3 = Run(m3, str(tmp_path / "split"))
    s3 = run3.load(m3.init_state())
    assert run3.tm.days == pytest.approx(20.0)
    s3 = run3.run(s3, days=20.0)

    np.testing.assert_allclose(np.asarray(s3.ocean.t),
                               np.asarray(s1.ocean.t), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s3.ocean.psi0),
                               np.asarray(s1.ocean.psi0), rtol=0, atol=0)

    cont = open(tmp_path / "cont" / "tsi.csv").read().strip().splitlines()
    split = open(tmp_path / "split" / "tsi.csv").read().strip().splitlines()
    assert cont == split


def test_nconv_abort(tmp_path):
    """Run aborts (and saves state) when the solver failure count
    exceeds 50 (tropic.F:249)."""
    m = _model()
    run = Run(m, str(tmp_path))
    state = m.init_state()
    state = state.replace(ocean=state.ocean.replace(
        nconv=jnp.asarray(51, jnp.int32)))
    with pytest.raises(RuntimeError, match="barotropic solver failed"):
        run.run(state, days=5.0)
    assert (tmp_path / "restart_abort.npz").exists()


def test_nconv_counts_real_nonconvergence():
    """With an absurdly tight tolerance and tiny iteration budget the
    counter must increment (the round-1 bug: `converged` was dropped)."""
    cfg = small_config()
    cfg = cfg.replace(ocean=dataclasses.replace(
        cfg.ocean, isopycmix=False, gent_mcwilliams=False,
        dtts=43200.0, dtuv=1800.0, dtsf=1800.0,
        tolrsf=1e-30, mxscan=2))
    m = CoupledModel(cfg)
    state = m.init_state()
    state = m.run(state, 1)
    assert int(state.ocean.nconv) > 0
