"""Per-component timing of the flagship ocean step on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from uvic_tpu.models.ocean.kernels import (adv_vel, clinic_step,
                                           tracer_step)
from uvic_tpu.ops.convection import convct_full
from uvic_tpu.ops.filters import fir_filter
from uvic_tpu.models.ocean.tropic import sfforc
from uvic_tpu.models.ocean.model import eos_state_from


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:8.3f} ms", flush=True)
    return out


m, state, forcing = ge._flagship(small=False, dtype="float32", mobi=False)
g = m.g
cfg = m.cfg.ocean

# full step reference
def full(s):
    return m._step_leapfrog(s, forcing)

state2 = timeit("full step", full, state)
state = state2

t_tau, tm1 = state.t, state.tm1
u_tau = m.full_velocity(state.u, state.psi0)
u_tm1 = m.full_velocity(state.um1, state.psi1)

av = jax.jit(lambda u: adv_vel(u[0], u[1], g, m.cyclic))
vet, vnt, vbt, veu, vnu, vbu = timeit("adv_vel", av, u_tau)

stf = forcing.stf
btf = jnp.zeros_like(stf)
c2dtts = 2.0 * cfg.dtts

ts = jax.jit(lambda a, b: tracer_step(
    a, b, vet, vnt, vbt, stf, btf, None, m.diff_cbt, m.kmt, m.tmask,
    g, c2dtts, cfg.tracer_advection, 0.0, m.cyclic, iso=None))
t_new = timeit("tracer_step (fct)", ts, t_tau, tm1)

cv = jax.jit(lambda t: convct_full(t, m.kmt, m.eos_c, m.eos_to,
                                   m.eos_so, m.tmask))
timeit("convct_full", cv, t_new)

ff = jax.jit(lambda t: fir_filter(t, m.tmask[None], m.npass_t,
                                  "symmetric", m.cyclic))
timeit("fir_filter tracers", ff, t_new)

rho = eos_state_from(m.eos_c, m.eos_to, m.eos_so, t_tau)
smf = forcing.smf
bmf = jnp.zeros_like(smf)
cl = jax.jit(lambda ut, utm: clinic_step(
    ut, utm, rho, veu, vnu, vbu, smf, bmf, m.visc_cbu, m.kmu,
    m.umask, g, 2.0 * cfg.dtuv, m.cyclic))
u_int_new, zu = timeit("clinic_step", cl, u_tau, u_tm1)

fu = jax.jit(lambda u: fir_filter(u, m.umask[None], m.npass_u,
                                  "asymmetric", m.cyclic))
timeit("fir_filter velocity", fu, u_int_new)

sf = jax.jit(lambda z: sfforc(z, g.dxu, g.dyu, g.csu))
forc = timeit("sfforc", sf, zu)

if m.cg_solver is not None:
    guess = state.ptd
    pc = jax.jit(lambda gu, fo: m.cg_solver(
        gu, fo, jnp.asarray(2.0 * cfg.dtsf, jnp.float32),
        jnp.asarray(cfg.tolrsf, jnp.float32)))
    dpsi, iters = timeit("pallas CG", pc, guess, forc)
    print("  iters:", int(iters), flush=True)

eo = jax.jit(lambda t: eos_state_from(m.eos_c, m.eos_to, m.eos_so, t))
timeit("eos", eo, t_tau)
