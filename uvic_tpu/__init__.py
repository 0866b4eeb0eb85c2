"""uvic_tpu — a TPU-native Earth System Climate Model.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the UVic
ESCM 2.9 (reference: andreasschmittner/UVic2.9, serial Fortran 77/90):

- ocean: MOM2-derived 3-D primitive-equation z-level model (rigid lid,
  streamfunction barotropic mode, FCT tracer advection, GM/Redi mixing)
- atmosphere: 2-D energy-moisture balance model (EMBM)
- sea ice: 0-layer thermodynamics + EVP dynamics
- land: MOSES/TRIFFID-derived MTLM
- sediments, NPZD/MOBI biogeochemistry

Design: full 3-D state arrays resident in HBM (no latitude memory window),
[..., km, jmt, imt] layout, functional leapfrog stepping under jit,
`shard_map` spatial domain decomposition with halo exchange over ICI,
conjugate-gradient barotropic solve with island constraints expressed as
segment reductions (psum-compatible).

Units are CGS throughout, matching the reference's parameter values
(source/common/pconst.h).
"""

import os


def _set_matmul_precision():
    """TPU matmuls default to bf16 inputs; climate dynamics integrate
    rounding noise for O(1e5) steps and the einsums on the hot path
    (zonal filter rows, vertical integrals feeding the barotropic
    solve) are tiny, so full-f32 precision is free.  A year-3 NaN on
    the earth config that CPU-f32 did not reproduce traced to exactly
    this difference."""
    try:
        import jax
        jax.config.update("jax_default_matmul_precision", "float32")
    except Exception:
        pass


_set_matmul_precision()


def enable_compile_cache(path=None):
    """Persistent XLA compilation cache (the fused Pallas kernels cost
    minutes to compile through the TPU tunnel; cache across processes).
    Call before the first jit dispatch."""
    import jax
    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


__version__ = "0.1.0"
