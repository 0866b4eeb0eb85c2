"""Per-component timing of the flagship (MOBI, isopyc/GM) step on TPU.

Breaks the 24.6 ms MOBI step into its phases to target Pallas fusion /
layout work.  Also times run_scan to separate per-step dispatch overhead
from device time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import __graft_entry__ as ge


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt*1e3:9.3f} ms", flush=True)
    return out


def main(mobi=True):
    m, state, forcing = ge._flagship(small=False, dtype="float32",
                                     mobi=mobi)
    g = m.g
    cfg = m.cfg.ocean
    print(f"nt={m.nt} grid={m.params.grid.km}x{m.params.grid.jmt}"
          f"x{m.params.grid.imt}", flush=True)

    step = jax.jit(lambda s, f: m._step(s, f, leapfrog=True))
    state = timeit("full step (jit, no donate)", step, state, forcing)

    # multi-step scan: device-side per-step time without dispatch
    NS = 20
    import functools
    @functools.partial(jax.jit, static_argnums=(2,))
    def scan_steps(s, f, ns):
        def body(c, _):
            return m._step(c, f, leapfrog=True), None
        out, _ = jax.lax.scan(body, s, None, length=ns)
        return out
    out = scan_steps(state, forcing, NS)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = scan_steps(out, forcing, NS)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / NS
    print(f"{'scan per-step':32s} {dt*1e3:9.3f} ms", flush=True)
    state = out

    t_tau, tm1 = state.t, state.tm1
    u_tau = m.full_velocity(state.u, state.psi0)
    u_tm1 = m.full_velocity(state.um1, state.psi1)

    from uvic_tpu.models.ocean.kernels import (adv_vel, clinic_step,
                                               tracer_step)
    av = jax.jit(lambda u: adv_vel(u[0], u[1], g, m.cyclic))
    vet, vnt, vbt, veu, vnu, vbu = timeit("adv_vel", av, u_tau)

    iso = None
    if cfg.isopycmix:
        from uvic_tpu.models.ocean.isopyc import compute_isopyc
        import dataclasses as _dc
        ic = jax.jit(lambda t: _dc.astuple(compute_isopyc(
            t, m.tmask, m.kmt, m.eos_c, m.eos_to, m.eos_so, g, cfg,
            m.cyclic, addisop=m.addisop)))
        from uvic_tpu.models.ocean.isopyc import IsopycFields
        iso = IsopycFields(*timeit("compute_isopyc", ic, tm1))

    src = None
    if m.npzd is not None:
        so = jax.jit(lambda t: m.npzd[True].sources(
            t, m.kmt, m.tmask, forcing.swr, forcing.aice, forcing.hice,
            forcing.hsno, m.tlat_rad, forcing.relyr))
        src = timeit("bgc sources", so, tm1)

    stf = forcing.stf
    btf = jnp.zeros_like(stf)
    c2dtts = 2.0 * cfg.dtts
    diff_cbt = m.diff_cbt + (iso.K33 if iso is not None else 0.0)
    vet_t = vet + (iso.vetiso if iso is not None else 0.0)
    vnt_t = vnt + (iso.vntiso if iso is not None else 0.0)
    vbt_t = vbt + (iso.vbtiso if iso is not None else 0.0)
    aidif = cfg.aidif if cfg.isopycmix else 0.0

    ts = jax.jit(lambda a, b, s: tracer_step(
        a, b, vet_t, vnt_t, vbt_t, stf, btf, s, diff_cbt, m.kmt,
        m.tmask, g, c2dtts, cfg.tracer_advection, aidif, m.cyclic,
        iso=iso))
    t_new = timeit("tracer_step (fct+iso)", ts, t_tau, tm1, src)

    # tracer_step without iso flux additions, same nt
    ts0 = jax.jit(lambda a, b: tracer_step(
        a, b, vet, vnt, vbt, stf, btf, None, m.diff_cbt, m.kmt,
        m.tmask, g, c2dtts, cfg.tracer_advection, 0.0, m.cyclic))
    timeit("tracer_step (fct only)", ts0, t_tau, tm1)

    from uvic_tpu.ops.convection import convct_full
    cv = jax.jit(lambda t: convct_full(t, m.kmt, m.eos_c, m.eos_to,
                                       m.eos_so, m.dztxcl))
    timeit("convct_full", cv, t_new)

    if m.filt_t is not None:
        timeit("hlat filter tracers", jax.jit(m.filt_t), t_new)

    from uvic_tpu.models.ocean.model import eos_state_from
    rho = eos_state_from(m.eos_c, m.eos_to, m.eos_so, t_tau)
    smf = forcing.smf
    bmf = jnp.zeros_like(smf)
    hmix_u = None
    if m.aniso_visc is not None:
        hmix_u = ("aniso", m.aniso_visc[0], m.aniso_visc[1])
    cl = jax.jit(lambda ut, utm: clinic_step(
        ut, utm, rho, veu, vnu, vbu, smf, bmf, m.visc_cbu, m.kmu,
        m.umask, g, 2.0 * cfg.dtuv, m.cyclic, hmix=hmix_u))
    u_int_new, zu = timeit("clinic_step", cl, u_tau, u_tm1)

    from uvic_tpu.models.ocean.tropic import tropic_step
    tr = jax.jit(lambda z, s: tropic_step(
        z, s.psi0, s.psi1, s.ptd, s.ptdb, m.cf_unit, m.cf_acor,
        m.isl, g.dxu, g.dyu, g.csu, 2.0 * cfg.dtsf, cfg.tolrsf,
        cfg.mxscan, True, m.cyclic, filt=m.filt_sf,
        solver=m.cg_solver, npt=cfg.sf_npt))
    o = timeit("tropic_step (CG)", tr, zu, state)
    print("  CG iters:", int(o[4]), flush=True)

    eo = jax.jit(lambda t: eos_state_from(m.eos_c, m.eos_to, m.eos_so, t))
    timeit("eos", eo, t_tau)


if __name__ == "__main__":
    main(mobi="--physics" not in sys.argv)
