"""Multi-host (DCN) launcher for the sharded ocean/coupled step.

The GSPMD code in uvic_tpu.parallel is mesh-agnostic: the same
program runs on 1 device, one host with N chips, or a multi-host slice
— the missing piece was the bootstrap (VERDICT r3 gap #5).  This
script is it:

  # one process per host, same command on every host:
  python scripts/run_multihost.py --coordinator HOST0:1234 \
      --num-processes 4 --process-id $RANK [--mesh 4,8] [--steps 20]

  # single-host degenerate mode (no distributed runtime), e.g. CI:
  python scripts/run_multihost.py --steps 5

How the DCN path works (jax-ml.github.io/scaling-book recipe):
- `jax.distributed.initialize` wires the hosts into one JAX runtime;
  `jax.devices()` then lists EVERY chip in the slice, ordered so that
  chips on the same host are contiguous,
- `make_mesh` lays the (y, x) mesh over that global device list; with
  the y (latitude) axis outermost, neighboring y-shards land on the
  same host where possible, so halo exchanges ride ICI and only the
  mesh-edge exchanges cross DCN,
- every host calls the SAME jitted step on its addressable shard of
  the global arrays; XLA inserts the cross-host collectives.

Each host feeds only its addressable shards
(jax.make_array_from_single_device_arrays would stream real per-host
data; here the demo state is small enough to build globally).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (enables DCN mode)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--mesh", default=None,
                   help="ny,nx (default: 2 x ndevices/2)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--cpu-mesh", type=int, default=0,
                   help="force an N-device virtual CPU mesh (validation "
                        "without hardware; conftest.py pattern)")
    p.add_argument("--out", default=None,
                   help="write a JSON artifact (process 0 only): mesh, "
                        "device counts, ms/step, state checksum")
    args = p.parse_args()

    if args.cpu_mesh:
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.cpu_mesh}").strip()
    import jax
    if args.cpu_mesh:
        # the session env preregisters a TPU-tunnel plugin through
        # sitecustomize, so the platform must be forced via jax.config
        jax.config.update("jax_platforms", "cpu")
    if args.coordinator is not None:
        # multi-host bootstrap: must run BEFORE any other jax call
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
        print(f"[host {jax.process_index()}/{jax.process_count()}] "
              f"{len(jax.local_devices())} local / "
              f"{len(jax.devices())} global devices", flush=True)

    import jax.numpy as jnp
    from uvic_tpu.config import ModelConfig
    from uvic_tpu.models.ocean.model import make_forcing, make_ocean
    from uvic_tpu.parallel.mesh import make_mesh, shard_pytree, shard_step

    ndev = len(jax.devices())
    jmt = imt = 102   # standard grid (size.h:27)
    if args.mesh:
        shape = tuple(int(v) for v in args.mesh.split(","))
    else:
        shape = (1, 1)
    # the GSPMD path needs the mesh to divide (jmt, imt); search the
    # largest divisible mesh within the device budget (102 = 2*3*17)
    if jmt % shape[0] or imt % shape[1]:
        best = (1, 1)
        for ny in (1, 2, 3, 6):
            for nx in (1, 2, 3, 6, 17):
                if ny * nx <= ndev and jmt % ny == 0 and imt % nx == 0 \
                        and ny * nx > best[0] * best[1]:
                    best = (ny, nx)
        print(f"mesh {shape} does not divide ({jmt},{imt}); "
              f"using {best}", flush=True)
        shape = best
    elif not args.mesh:
        best = (1, 1)
        for ny in (1, 2, 3, 6):
            for nx in (1, 2, 3, 6, 17):
                if ny * nx <= ndev and ny * nx > best[0] * best[1]:
                    best = (ny, nx)
        shape = best
    mesh = make_mesh(shape)
    print(f"mesh {shape} over {ndev} devices "
          f"({jax.process_count() if args.coordinator else 1} host(s))",
          flush=True)

    cfg = ModelConfig().replace(dtype="float32")
    m = make_ocean(cfg)
    g = m.params.grid
    t0 = np.zeros((m.nt, g.km, g.jmt, g.imt))
    t0[0] = (20.0 * np.exp(-np.asarray(g.zt) / 1000e2))[:, None, None]
    t0 *= np.asarray(m.params.topo.tmask)
    state = m.init_state(t0)
    yu = np.asarray(g.yu)
    taux = np.sin(np.deg2rad(yu * 3))[:, None] * np.ones((1, g.imt))
    smf = jnp.asarray(np.stack([taux / 1.035, np.zeros_like(taux)]),
                      m.cfg.np_dtype)
    stf = jnp.zeros((m.nt, g.jmt, g.imt), m.cfg.np_dtype)
    forcing = make_forcing(smf, stf)

    state = shard_pytree(state, mesh)
    forcing = shard_pytree(forcing, mesh)
    step = shard_step(lambda s, f: m._step(s, f, leapfrog=True),
                      mesh, state, forcing)

    state = step(state, forcing)          # compile
    jax.block_until_ready(state)
    t0_w = time.time()
    for _ in range(args.steps):
        state = step(state, forcing)
    jax.block_until_ready(state)
    dt_step = (time.time() - t0_w) / args.steps
    nan = bool(jnp.isnan(state.t).any())
    # cross-run comparison checksum: a collective sum every process
    # agrees on (the 2-process run must match the 1-process run)
    checksum = float(jnp.sum(state.t[0], dtype=jnp.float32))
    ke = float(jnp.sum(state.u ** 2, dtype=jnp.float32))
    if args.coordinator is None or jax.process_index() == 0:
        print(f"{args.steps} sharded steps: {dt_step*1e3:.2f} ms/step, "
              f"nan={nan} checksum={checksum!r}", flush=True)
        if args.out:
            import json
            with open(args.out, "w") as f:
                json.dump(dict(
                    processes=(jax.process_count()
                               if args.coordinator else 1),
                    global_devices=ndev,
                    local_devices=len(jax.local_devices()),
                    mesh=list(shape), steps=args.steps,
                    ms_per_step=round(dt_step * 1e3, 2),
                    checksum_t0=checksum, checksum_ke=ke,
                    nan=nan), f)
    assert not nan


if __name__ == "__main__":
    main()
