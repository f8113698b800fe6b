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


class SegmentAuditExceeded(Exception):
    """The AOT compile audit found a segment whose XLA-assigned peak
    (arguments + outputs + temps + buffers held across the segment)
    exceeds the HBM budget — raised BEFORE any device work."""

    def __init__(self, segment, peak_bytes, budget_bytes):
        self.segment = segment
        self.peak_bytes = peak_bytes
        self.budget_bytes = budget_bytes
        super().__init__(
            f"segment {segment} needs {peak_bytes / 2**30:.2f} GiB "
            f"(XLA buffer assignment + held buffers) of "
            f"{budget_bytes / 2**30:.2f} GiB HBM")


class SegmentCompileFailed(Exception):
    """A segment program failed to COMPILE during the AOT probe (no
    device work has happened).  At width > 1 this is overwhelmingly a
    resource failure — the remote compile helper reports HBM exhaustion
    as an opaque subprocess error — so the caller retries smaller; at
    width 1 the underlying error propagates."""

    def __init__(self, segment, cause):
        self.segment = segment
        self.cause = cause
        super().__init__(f"segment {segment} failed to compile: {cause}")


def _leaf_bytes(tree):
    return sum(int(np.prod(leaf.shape)) * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(tree))


def make_segmented_executor(steps, apply_step, field, segment_steps=64,
                            vmapped=False, input_shapes=None,
                            hbm_budget_bytes=None):
    """Build (run_once, final_id): run_once(bufs dict) executes all segments,
    mutating the buffer table, and returns the final buffer.

    ``vmapped``: the buffers carry a leading slice-batch axis; every
    segment program runs under jax.vmap over it.

    ``input_shapes``: initial buffer table as ShapeDtypeStructs
    ({tid: pytree}).  When given, every segment program is AOT-lowered
    and compiled up front and audited against ``hbm_budget_bytes`` using
    **XLA's own buffer assignment** (``compiled.memory_analysis()``:
    args + outputs + temps, plus the table buffers held across the
    segment).  The analytic at-width model cannot see XLA's segment
    temps — on the n53 sc24 scheme it modeled 0.8 GiB at width 2 where
    XLA assigns 12.5 GiB (docs/BENCH_NOTES.md round 5) — so segmented
    width decisions audit against the compiler, not the model.  Raises
    SegmentAuditExceeded before any device work when over budget.
    Execution always goes through the jit fast path — the known-good
    dispatch route (0.44 s/slice on the n53 bench); executing the AOT
    Compiled objects directly measured slower on the tunneled backend
    (the A/B was confounded by tunnel degradation, so jit stays the
    conservative choice — docs/BENCH_NOTES.md round 5).  With the
    persistent compile cache on, the jit call of an audited segment is
    a cache hit of the probe's compile.
    """
    segments = [list(steps[i:i + segment_steps])
                for i in range(0, len(steps), segment_steps)]
    io, final_id = _segment_io(segments, None)

    seg_fns = []
    shapes = None if input_shapes is None else dict(input_shapes)
    for si, (seg, (inputs, outputs)) in enumerate(zip(segments, io)):
        def make(seg=seg, inputs=tuple(inputs), outputs=tuple(outputs)):
            def fn(*arrays):
                local = dict(zip(inputs, arrays))
                for st in seg:
                    local[st.i] = apply_step(field, local[st.i], local[st.j], st)
                    local[st.j] = None
                return tuple(local[t] for t in outputs)
            # inputs not returned can be donated (freed eagerly on device)
            donate = tuple(k for k, t in enumerate(inputs) if t not in outputs)
            return jax.jit(jax.vmap(fn) if vmapped else fn,
                           donate_argnums=donate)
        fn = make()
        inputs, outputs = tuple(inputs), tuple(outputs)
        if shapes is not None:
            args = [shapes[t] for t in inputs]
            if hbm_budget_bytes:
                try:
                    compiled = fn.lower(*args).compile()
                except Exception as e:
                    # nothing has executed yet — let the caller retry the
                    # probe at a smaller width (the compile helper reports
                    # HBM exhaustion as an opaque subprocess failure)
                    raise SegmentCompileFailed(si, e) from e
                held = sum(_leaf_bytes(s) for t, s in shapes.items()
                           if t not in inputs and s is not None)
                try:
                    ma = compiled.memory_analysis()
                    peak = (ma.argument_size_in_bytes
                            + ma.output_size_in_bytes
                            + ma.temp_size_in_bytes
                            - getattr(ma, "alias_size_in_bytes", 0))
                except Exception:   # backend without a memory analysis
                    peak = None
                if peak is not None and peak + held > hbm_budget_bytes:
                    raise SegmentAuditExceeded(si, peak + held,
                                               hbm_budget_bytes)
                # EXECUTION stays on the jit fast path (the compiled
                # AOT object is only the audit's evidence); the jit
                # call recompiles the same HLO — a persistent-cache
                # hit when the cache is on.
            outs = jax.eval_shape(fn, *args)
            for t, s in zip(outputs, outs):
                shapes[t] = s
            for t in inputs:
                if t not in outputs:
                    shapes[t] = None
        seg_fns.append((fn, inputs, outputs))

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


def _is_device_oom(e):
    """True only for a genuine device/compiler memory exhaustion.

    The retry path must not swallow unrelated errors whose message merely
    contains 'memory' (e.g. a shape error mentioning 'memory layout') —
    round-4 advisor finding.  Recognized: jax's XlaRuntimeError carrying a
    RESOURCE_EXHAUSTED status, and the remote-compile helper's explicit
    HBM-demand report ('used X of Y hbm')."""
    try:
        from jax.errors import JaxRuntimeError as _XlaErr
    except ImportError:  # older jax spells it XlaRuntimeError
        try:
            from jax._src.lib import xla_client
            _XlaErr = xla_client.XlaRuntimeError
        except Exception:  # pragma: no cover - very old jax
            _XlaErr = ()
    msg = str(e)
    if isinstance(e, _XlaErr) and (
            "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
            or "out of memory" in msg):
        return True
    # the environment's remote compile helper reports HBM exhaustion as a
    # plain RuntimeError with an explicit demand line
    low = msg.lower()
    return ("hbm" in low and ("used" in low or "exceeded" in low
                              or "out of memory" in low)) \
        or "resource_exhausted" in low


def run_segmented(tensors, steps, slicing_axes, num_sliced, output_shape,
                  field, apply_step, segment_steps=64, progress=None,
                  slice_batch=1, slice_ids=None, audit_width=True):
    """Full contraction in segmented mode with a host-side slice loop.

    ``slice_batch`` > 1 vmaps that many slices through every segment
    program — the same MXU-utilization lever the monolithic path has
    (measured 12.0 -> 5.8 s there); peak memory scales with the width.
    ``slice_ids`` restricts the loop to a subset of slice ids (the
    multi-device composition partitions ids across devices).
    ``audit_width``: the requested width is first clamped by the cheap
    analytic screen (metrics.max_safe_slice_batch), then PROVEN by
    AOT-compiling the segment programs and checking XLA's own buffer
    assignment against the HBM budget — the audit that predicts the
    working width before any device work (the analytic model alone
    missed 12 GiB of n53 segment temps; VERDICT r4 item 5).  Pass
    False to force the width unaudited.
    """
    import logging

    from .executor import slice_select

    log = logging.getLogger(__name__)
    total = 2 ** num_sliced if num_sliced else 1
    ids = list(range(total)) if slice_ids is None else list(slice_ids)
    if audit_width and slice_batch > 1:
        from .metrics import max_safe_slice_batch
        safe = max_safe_slice_batch(steps, slice_batch,
                                    slicing_axes=slicing_axes)
        if safe < slice_batch:
            log.warning(
                "segmented slice_batch %d exceeds the temp-aware HBM "
                "audit; clamping to %d", slice_batch, safe)
            slice_batch = safe

    def attempt(W):
        if W == 1:
            select = jax.jit(lambda ts, sid: slice_select(
                ts, slicing_axes, sid, num_sliced, field))
        else:
            select = jax.jit(lambda ts, sids: jax.vmap(
                lambda s: slice_select(ts, slicing_axes, s, num_sliced,
                                       field))(sids))
        input_shapes = None
        budget = None
        if audit_width and W > 1:   # width 1 is the floor — no probe
            from ..cache import enable_compile_cache
            from ..planner.cost import HBM_BUDGET_BYTES
            enable_compile_cache()  # probe compiles = warm jit compiles
            budget = HBM_BUDGET_BYTES
            if num_sliced:
                table = jax.eval_shape(select, list(tensors),
                                       np.zeros(W, dtype=np.int32))
            else:
                table = jax.eval_shape(lambda ts: ts, list(tensors))
            input_shapes = dict(enumerate(table))
        run_once, _ = make_segmented_executor(
            steps, apply_step, field, segment_steps, vmapped=W > 1,
            input_shapes=input_shapes, hbm_budget_bytes=budget)
        add = jax.jit(field.add)
        acc = None
        for kx in range(0, len(ids), W):
            if not num_sliced:
                sliced = list(tensors)
            elif W == 1:
                sliced = select(list(tensors), np.int32(ids[kx]))
            else:
                sliced = select(list(tensors),
                                np.asarray(ids[kx:kx + W], dtype=np.int32))
            result = run_once({i: t for i, t in enumerate(sliced)})
            if W > 1:
                result = jax.jit(field.sum0)(result) \
                    if hasattr(field, "sum0") \
                    else jax.jit(lambda r: jax.tree.map(
                        lambda p: p.sum(0), r))(result)
            acc = result if acc is None else add(acc, result)
            if progress is not None:
                progress(kx + W, len(ids))
        return acc

    W = slice_batch if slice_batch > 1 and len(ids) % slice_batch == 0 else 1
    while True:
        try:
            return attempt(W)
        except (SegmentAuditExceeded, SegmentCompileFailed) as e:
            # probe phase: no device work has happened; at width 1 a
            # compile failure is a real error, an audit failure means
            # the scheme cannot run segmented on this chip at all
            if not (audit_width and W > 1):
                raise (e.cause if isinstance(e, SegmentCompileFailed)
                       else e)
            W //= 2
            log.warning("segmented width probe rejected (%s); "
                        "retrying with slice_batch=%d",
                        str(e).splitlines()[0][:120], W)
        except Exception as e:  # noqa: BLE001 — narrowed by _is_device_oom
            if not (audit_width and W > 1 and _is_device_oom(e)):
                raise
            # runtime backstop: the compile-time audit passed but the
            # allocator still refused (transient fragmentation); halve
            # and restart — first-batch failure, nothing accumulated
            W //= 2
            log.warning("segmented slice batch OOM'd on device (%s); "
                        "retrying with slice_batch=%d",
                        str(e).splitlines()[0][:120], W)


def run_segmented_sharded(tensors, steps, slicing_axes, num_sliced,
                          output_shape, field, apply_step, devices,
                          segment_steps=64, slice_batch=1):
    """Segmented execution with slice ranges partitioned across devices.

    The pod-scale composition the monolithic shard_map path cannot offer
    (its one XLA program does not compile at 400+ steps): each device runs
    the SAME compiled segment programs over its own contiguous slice
    range — dispatch is async, so all device queues fill concurrently —
    and the per-device partial accumulators are summed at the end.
    Single-process multi-device; for multi-host see parallel/distributed.
    """
    total = 2 ** num_sliced if num_sliced else 1
    n_dev = len(devices)
    partials = []
    for d, dev in enumerate(devices):
        ids = range(d * total // n_dev, (d + 1) * total // n_dev)
        if not len(ids):
            continue
        with jax.default_device(dev):
            placed = jax.device_put(list(tensors), dev)
            partials.append(run_segmented(
                placed, steps, slicing_axes, num_sliced, output_shape,
                field, apply_step, segment_steps, slice_batch=slice_batch,
                slice_ids=ids))
    acc = None
    add = jax.jit(field.add)
    for p in partials:
        p = jax.device_put(p, devices[0])
        acc = p if acc is None else add(acc, p)
    return acc
