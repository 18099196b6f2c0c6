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


def _enable_persistent_compile_cache():
    """Point JAX at an on-disk compilation cache unless the user already
    configured one. TPU compiles of the sweep kernels run 30-100 s (more
    through a tunneled backend); the cache turns every repeat launch of the
    same program — reruns, resumed soaks, CLI invocations — into a
    sub-second deserialization. Opt out with JAX_COMPILATION_CACHE_DIR=''
    (empty) or by setting the env var / config yourself."""
    import os

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env is not None:  # user decided (set or explicitly empty)
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "cmdlmc_tpu", "jax_cache"
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


_enable_persistent_compile_cache()
