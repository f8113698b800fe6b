"""Persistent XLA compilation cache, on by default for every entry point.

Contraction programs are large (hundreds of fused steps) and compile for
minutes; they are also completely static per (plan, bitstring batch), so a
warm process should never recompile.  The reference has no analogue (torch
eager launches per step); for this runtime the cache is the difference
between a 6-minute and a 2-second start (docs/BENCH_NOTES.md).

``enable_compile_cache()`` is idempotent and called from the CLI,
``TensorNetworkSimulation.contraction`` and ``bench.py``.  Control:

  ARTENSOR_TPU_CACHE=<dir>   cache directory (default ~/.cache/artensor_tpu)
  ARTENSOR_TPU_CACHE=0       disable
"""

import os

_done = False


def enable_compile_cache(path=None):
    """Point jax's persistent compilation cache at a durable directory."""
    global _done
    if _done:
        return
    env = os.environ.get("ARTENSOR_TPU_CACHE")
    if env == "0":
        _done = True
        return
    import jax

    if path is None:
        path = env or os.path.join(
            os.path.expanduser("~"), ".cache", "artensor_tpu", "jax")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:  # pragma: no cover - read-only fs etc.
        pass
    _done = True
