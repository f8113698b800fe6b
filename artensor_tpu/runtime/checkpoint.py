"""Checkpoint/resume and retry for long sliced contractions.

Slices are idempotent sub-tasks summed into one accumulator (SURVEY.md §5
notes the reference has no recovery story despite this natural boundary).
``run_sliced_checkpointed`` walks the 2^k slice ids in chunks through the
jitted runner, persists the partial accumulator + next slice id after every
chunk, resumes from the newest checkpoint on restart, and retries transient
chunk failures (device/tunnel hiccups) with re-staged inputs.
"""

import logging
import os
import tempfile

import numpy as np


def run_sliced_checkpointed(run, tensors, num_sliced, output_shape, field,
                            path, chunk=None, max_retries=2, progress=None):
    """Execute ``run(tensors, slice_ids, init=...)`` over all slices.

    Parameters
    ----------
    run : the (jitted) runner from make_sliced_runner — must accept explicit
        ``slice_ids`` and ``init``.
    path : checkpoint file (.npz).  Removed on successful completion.
    chunk : slice ids per checkpoint interval (default: one 2^(k-3) eighth,
        at least 1).
    """
    import jax.numpy as jnp

    from .lowering import physical_shape

    total = 2 ** num_sliced
    chunk = chunk or max(1, total // 8)
    start = 0
    # the runner accumulates in FLAT physical form (d0, prod(rest)), not the
    # logical output shape — a logical-shaped init broadcasts wrong for any
    # >=3-dim output
    acc = field.zeros(physical_shape(output_shape))
    if path and os.path.exists(path):
        saved = np.load(path)
        start = int(saved["next_slice"])
        acc = (jnp.asarray(saved["acc_re"]), jnp.asarray(saved["acc_im"])) \
            if "acc_im" in saved else jnp.asarray(saved["acc"])
    while start < total:
        stop = min(start + chunk, total)
        ids = jnp.arange(start, stop, dtype=jnp.int32)
        attempt = 0
        while True:
            try:
                acc_new = run(list(tensors), ids, init=acc)
                # force completion so failures surface here, not at save
                if isinstance(acc_new, tuple):
                    acc_host = (np.asarray(acc_new[0]), np.asarray(acc_new[1]))
                else:
                    acc_host = np.asarray(acc_new)
                break
            except (TypeError, ValueError):
                # deterministic trace/shape errors: retrying cannot help
                raise
            except Exception as e:
                attempt += 1
                logging.getLogger(__name__).warning(
                    "slice chunk [%d, %d) failed (attempt %d/%d): %r",
                    start, stop, attempt, max_retries, e)
                if attempt > max_retries:
                    raise
        acc = acc_new
        if path:
            _atomic_save(path, acc_host, stop)
        if progress is not None:
            progress(stop, total)
        start = stop
    if path and os.path.exists(path):
        os.remove(path)
    return acc


def _atomic_save(path, acc_host, next_slice):
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        if isinstance(acc_host, tuple):
            np.savez(tmp, acc_re=acc_host[0], acc_im=acc_host[1],
                     next_slice=next_slice)
        else:
            np.savez(tmp, acc=acc_host, next_slice=next_slice)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
