"""cmdlmc_tpu — a TPU-native kinetic Monte Carlo framework for cMD/LMC simulations.

Re-implements the capabilities of the reference cMD/LMC package (combined molecular
dynamics / lattice Monte Carlo simulation of proton transport in hydrogen-bonded
solids; see /root/reference/mdlmc/__init__.py:3-4) as a JAX/XLA/Pallas framework:

* geometry (periodic minimum image, pairwise distances, angles) as pure JAX ops and
  Pallas TPU kernels (replaces cython_exts/LMC/PBCHelper.pyx, atoms/numpyatom.pyx),
* per-frame neighbor topology as dense masked tensor ops (replaces topo/topology.py's
  generator + scipy.sparse pipeline),
* the time-dependent KMC clock ("fastforward_to_next_jump", LMC/MDMC.py:121-171)
  recast as a per-frame state machine inside `lax.scan`,
* proton-hop events selected by two-stage categorical sampling whose rate reductions
  are MXU matmuls over replica occupancy matrices,
* thousands of independent KMC replicas vmapped per chip and sharded across chips
  over ICI via `jax.sharding` (the reference is single-threaded CPU only).
"""

__version__ = "0.1.0"
