"""Reproduce the bench NaN: flagship std grid on TPU, pallas CG vs jnp CG."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print("importing entry...", flush=True)
import __graft_entry__ as ge

print("building flagship...", flush=True)
m, state, forcing = ge._flagship(small=False, dtype="float32", mobi=False)
print("pallas solver active:", m.cg_solver is not None, flush=True)

# step with pallas (default) and with pallas disabled, per-step compare
m_nop, state2, _ = ge._flagship(small=False, dtype="float32", mobi=False)
m_nop.cg_solver = None
print("both models built", flush=True)

for k in range(8):
    state = m.step(state, forcing, leapfrog=(k > 0))
    state2 = m_nop.step(state2, forcing, leapfrog=(k > 0))
    jax.block_until_ready((state, state2))
    pnan = bool(jnp.isnan(state.psi0).any())
    tnan = bool(jnp.isnan(state.t).any())
    dpsi = float(jnp.abs(state.psi0 - state2.psi0).max())
    mpsi = float(jnp.abs(state2.psi0).max())
    print(f"step {k}: pallas psi_nan={pnan} t_nan={tnan} "
          f"|dpsi|={dpsi:.3e} |psi_ref|={mpsi:.3e} "
          f"ref_nan={bool(jnp.isnan(state2.psi0).any())}", flush=True)
    if pnan or tnan:
        # drill into the solver on the offending inputs
        break
