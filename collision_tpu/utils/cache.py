"""Compilation persistence.

The reference's only persistent state is its compiled OpenCL programs,
shared across instances via constructor injection (SURVEY.md §5: the
rebuild equivalent is the jit cache). This helper turns on JAX's on-disk
compilation cache so the expensive first-compile of the jitted collide
step (tens of seconds for the 1M-sphere program) is paid once per machine
rather than once per process.
"""

import os


def enable_compilation_cache(path="~/.cache/collision_tpu_xla"):
    """Enable JAX's persistent compilation cache at ``path``.

    Safe to call multiple times; call before the first jitted execution
    for maximum effect.
    """
    import jax

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
