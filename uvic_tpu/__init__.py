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

__version__ = "0.1.0"
