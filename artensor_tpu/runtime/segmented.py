"""Segmented execution: split a huge scheme into several jitted programs.

One monolithic XLA program is the fastest path (zero dispatch between
steps), but its compile cost and compiler memory grow with program size —
the environment's TPU compile helper gets OOM-killed on the largest
schemes.  Segmented mode compiles the scheme as a handful of programs of
``segment_steps`` steps each and walks them from Python; intermediate
buffers stay on device, consumed inputs are donated, and the per-segment
dispatch (~30ms on the tunneled TPU) is amortized over seconds of MXU work.

The slice loop becomes a host loop over slice ids (each slice runs the same
compiled segments, so compilation happens once).
"""

import jax
import numpy as np

from .executor import apply_dense_step
from .sparse import apply_sparse_step


def _segment_io(segments, n_bufs):
    """Per-segment (inputs, outputs): which buffer ids a segment consumes
    from the host-side buffer table and which it must hand back."""
    reads_later = [set() for _ in segments]
    acc = set()
    final_id = segments[-1][-1].i
    acc.add(final_id)
    for s in range(len(segments) - 1, -1, -1):
        reads_later[s] = set(acc)
        for st in segments[s]:
            acc.add(st.i)
            acc.add(st.j)
    io = []
    for s, seg in enumerate(segments):
        produced = set()
        inputs = []
        for st in seg:
            for tid in (st.i, st.j):
                if tid not in produced and tid not in inputs:
                    inputs.append(tid)
            produced.add(st.i)
        needed_after = reads_later[s]  # = final ∪ reads of segments after s
        outputs = [tid for tid in sorted(produced) if tid in needed_after]
        io.append((inputs, outputs))
    return io, final_id


def make_segmented_executor(steps, apply_step, field, segment_steps=64):
    """Build (run_once, final_id): run_once(bufs dict) executes all segments,
    mutating the buffer table, and returns the final buffer."""
    segments = [list(steps[i:i + segment_steps])
                for i in range(0, len(steps), segment_steps)]
    io, final_id = _segment_io(segments, None)

    seg_fns = []
    for seg, (inputs, outputs) in zip(segments, io):
        def make(seg=seg, inputs=tuple(inputs), outputs=tuple(outputs)):
            def fn(*arrays):
                local = dict(zip(inputs, arrays))
                for st in seg:
                    local[st.i] = apply_step(field, local[st.i], local[st.j], st)
                    local[st.j] = None
                return tuple(local[t] for t in outputs)
            # inputs not returned can be donated (freed eagerly on device)
            donate = tuple(k for k, t in enumerate(inputs) if t not in outputs)
            return jax.jit(fn, donate_argnums=donate)
        seg_fns.append((make(), tuple(inputs), tuple(outputs)))

    def run_once(bufs):
        for fn, inputs, outputs in seg_fns:
            outs = fn(*(bufs[t] for t in inputs))
            for t in inputs:
                if t not in outputs:
                    bufs[t] = None
            for t, v in zip(outputs, outs):
                bufs[t] = v
        return bufs[final_id]

    return run_once, final_id


def run_segmented(tensors, steps, slicing_axes, num_sliced, output_shape,
                  field, apply_step, segment_steps=64, progress=None):
    """Full contraction in segmented mode with a host-side slice loop."""
    from .executor import slice_select

    run_once, _ = make_segmented_executor(steps, apply_step, field, segment_steps)
    select = jax.jit(
        lambda ts, sid: slice_select(ts, slicing_axes, sid, num_sliced, field))
    acc = None
    total = 2 ** num_sliced if num_sliced else 1
    for sid in range(total):
        if num_sliced:
            sliced = select(list(tensors), np.int32(sid))
        else:
            sliced = list(tensors)
        result = run_once({i: t for i, t in enumerate(sliced)})
        acc = result if acc is None else jax.jit(field.add)(acc, result)
        if progress is not None:
            progress(sid, total)
    return acc
