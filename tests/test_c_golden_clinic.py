"""Cross-language golden trajectory for the baroclinic momentum step.

golden/c_golden/clinic_golden.c independently implements the clinic
spec (clinic.F:84-472: hydrostatic pressure-gradient integration,
advective/diffusive/Coriolis/metric updates, vertical-mean removal)
plus the U-cell face velocities (adv_vel.F:166-249).  Both sides read
bitwise-identical constants; the leapfrog internal-mode velocity
trajectories must agree to accumulated round-off.
"""

import os
import struct
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvic_tpu.config import small_config
from uvic_tpu.models.ocean.model import eos_state_from, make_ocean
from uvic_tpu.models.ocean.kernels import adv_vel, clinic_step
from uvic_tpu.ops.stencil import setbcx

HERE = os.path.dirname(os.path.abspath(__file__))
CDIR = os.path.join(HERE, "..", "golden", "c_golden")


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    exe = tmp_path_factory.mktemp("cgold") / "clinic_golden"
    src = os.path.join(CDIR, "clinic_golden.c")
    subprocess.run(["gcc", "-O2", "-std=c99", "-o", str(exe), src,
                    "-lm"], check=True)
    return str(exe)


def test_c_golden_clinic_trajectory(binary, tmp_path):
    nsteps = 10
    cfg = small_config(imt=40, jmt=34, km=8)
    m = make_ocean(cfg)
    g, bag, params = m.params.grid, m.g, m.params
    km, jmt, imt = g.km, g.jmt, g.imt
    c2dtuv = 2.0 * 1800.0

    rng = np.random.default_rng(11)
    umask = np.asarray(m.umask)
    tmask = np.asarray(m.tmask)

    # density from a stratified + laterally structured tracer state
    t0 = np.zeros((2, km, jmt, imt))
    lat = np.asarray(g.yt)[:, None]
    t0[0] = ((18.0 * np.exp(-np.asarray(g.zt) / 800e2))[:, None, None]
             * (0.6 + 0.4 * np.cos(np.deg2rad(lat)))[None])
    t0[1] = 1e-3 * rng.normal(size=(km, jmt, imt))
    t0 *= tmask
    t0 = np.asarray(setbcx(jnp.asarray(t0), True))
    rho = np.asarray(eos_state_from(m.eos_c, m.eos_to, m.eos_so,
                                    jnp.asarray(t0)))

    # initial internal velocity: smooth masked shear flow
    u0 = np.zeros((2, km, jmt, imt))
    u0[0] = (4.0 * np.cos(np.deg2rad(np.asarray(g.yu)))[None, :, None]
             * np.exp(-np.asarray(g.zt) / 1500e2)[:, None, None])
    u0[1] = (1.5 * np.sin(np.deg2rad(2 * np.asarray(g.yu)))[None, :, None]
             * np.exp(-np.asarray(g.zt) / 1500e2)[:, None, None])
    u0 *= umask
    u0 = np.asarray(setbcx(jnp.asarray(u0), True))

    smf = np.zeros((2, jmt, imt))
    smf[0] = 0.8 * np.sin(np.deg2rad(3 * np.asarray(g.yu)))[:, None]
    smf *= umask[0]
    bmf = np.zeros((2, jmt, imt))

    visc_cbu = np.asarray(m.visc_cbu)
    kmu = np.asarray(m.kmu)

    am_csudxtr = (bag.am * np.asarray(g.csur)[:, None]
                  * np.roll(np.asarray(g.dxtr), -1)[None, :])

    def arrs():
        yield np.asarray(g.dxu)
        yield np.asarray(g.dyu)
        yield np.asarray(g.csu)
        yield np.asarray(g.dxt2r)
        yield np.asarray(g.dyt2r)
        yield np.asarray(g.dxtr)
        yield np.asarray(g.dytr)
        yield np.asarray(g.cstr)
        yield np.asarray(g.dzt)
        yield np.asarray(g.duw)
        yield np.asarray(g.due)
        yield np.asarray(g.dun)
        yield np.asarray(g.dus)
        yield np.asarray(g.dxur)
        yield np.asarray(g.dyur)
        yield np.asarray(g.csur)
        yield np.asarray(g.cst)
        yield np.asarray(g.dzt2r)
        yield np.asarray(g.dztr)
        yield np.asarray(g.dzw)[:km]          # dzwA
        yield np.asarray(g.dzwr)[1:]          # dzwr at cell bottoms
        yield np.asarray(g.dxu2r)
        yield np.asarray(g.dyu2r)
        yield np.asarray(g.dyu4r)
        yield np.asarray(bag.csudxu2r)
        yield np.asarray(bag.csudxur)
        yield np.asarray(bag.csudyu2r)
        yield am_csudxtr
        yield np.asarray(params.amc_north)
        yield np.asarray(params.amc_south)
        yield np.asarray(params.am3)
        yield np.asarray(params.am4)
        yield np.asarray(params.advmet)
        yield np.asarray(g.dxmetr)
        yield np.asarray(params.cori)
        yield np.asarray(m.g.hr)
        yield kmu.astype(np.float64)
        yield umask
        yield visc_cbu
        yield smf
        yield bmf
        yield rho
        yield u0

    blob = tmp_path / "clinic_in.bin"
    with open(blob, "wb") as f:
        f.write(struct.pack("<4i", km, jmt, imt, nsteps))
        f.write(struct.pack("<2d", c2dtuv, float(bag.grav_rho0r)))
        for a in arrs():
            f.write(np.ascontiguousarray(a, dtype="<f8").tobytes())

    out = tmp_path / "clinic_out.bin"
    subprocess.run([binary, str(blob), str(out)], check=True)
    u_c = np.fromfile(out, dtype="<f8").reshape(2, km, jmt, imt)

    # ---- JAX trajectory --------------------------------------------------
    rho_j = jnp.asarray(rho)
    smf_j, bmf_j = jnp.asarray(smf), jnp.asarray(bmf)

    @jax.jit
    def step(u_tau, u_tm1):
        _, _, _, veu, vnu, vbu = adv_vel(u_tau[0], u_tau[1], bag, True)
        u_int, zu = clinic_step(u_tau, u_tm1, rho_j, veu, vnu, vbu,
                                smf_j, bmf_j, m.visc_cbu, m.kmu,
                                m.umask, bag, c2dtuv, True)
        return u_int

    u_tau = u_tm1 = jnp.asarray(u0)
    for _ in range(nsteps):
        u_tau, u_tm1 = step(u_tau, u_tm1), u_tau

    u_j = np.asarray(u_tau)
    assert np.isfinite(u_c).all() and np.isfinite(u_j).all()
    # non-vacuity: flow evolved and pressure gradients acted
    assert np.abs(u_j - u0).max() > 1e-2
    np.testing.assert_allclose(u_j, u_c, rtol=1e-9, atol=1e-12)
