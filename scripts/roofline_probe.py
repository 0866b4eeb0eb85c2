"""Measure this chip's streaming HBM bandwidth + MXU matmul rate with
dependency-chained iterations (each output feeds the next call), and a
scan-based variant to exclude dispatch pipelining artifacts."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t_chain(fn, x, n=20):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n


def t_scan(fn, x, n=50):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    y = run(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = run(x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (128, 1024, 1024), jnp.float32)
f = jax.jit(lambda a: a * 1.000001 + 1e-9)
dt = t_chain(f, x)
print(f"stream chain {dt*1e3:8.3f} ms -> {2*x.size*4/dt/1e9:8.1f} GB/s")
dt = t_scan(f, x, n=20)
print(f"stream scan  {dt*1e3:8.3f} ms -> {2*x.size*4/dt/1e9:8.1f} GB/s")

y = jax.random.normal(key, (41, 19, 102, 102), jnp.float32)
f2 = jax.jit(lambda a: a * 1.000001 + 1e-9)
dt = t_scan(f2, y, n=200)
print(f"tracer-shaped scan {dt*1e3:8.3f} ms -> "
      f"{2*y.size*4/dt/1e9:8.1f} GB/s")

f3 = jax.jit(lambda a: jnp.roll(a, 1, axis=-1) * 0.5
             + jnp.roll(a, -1, axis=-2) * 0.5)
dt = t_scan(f3, y, n=200)
print(f"2rolls scan        {dt*1e3:8.3f} ms -> "
      f"{3*y.size*4/dt/1e9:8.1f} GB/s eff")

a = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
dt = t_scan(lambda m: (m @ m) * 1e-4, a, n=20)
print(f"matmul bf16 8k scan: {dt*1e3:8.3f} ms -> "
      f"{2*8192**3/dt/1e12:6.1f} TFLOP/s")
print(jax.devices())
