"""Observability: predicted-vs-achieved cost reporting.

The planner's tc/sc/mc numbers ARE the performance model (the reference
prints them and nothing else; SURVEY.md §5).  Here they become a structured
report: predicted real FLOPs from the lowered steps, achieved wall clock,
sustained throughput, and a census of data-movement modes — enough to see
at a glance whether a plan runs at speed-of-light or is reorder-bound.
"""

import time
from dataclasses import dataclass, field


def step_flops(low, complex_algo="naive"):
    """Real FLOPs of one lowered step (split-complex matmul counting)."""
    from .lowering import _prod

    # dot output dims: batch * lhs-free * rhs-free; contraction size from dnums
    (cx, _cy), (bx, _by) = low.dnums
    B = _prod(low.shape_l[d] for d in bx)
    K = _prod(low.shape_l[d] for d in cx)
    M = _prod(low.shape_l) // max(B * K, 1)
    N = _prod(low.shape_r) // max(B * K, 1)
    mults = 3 if complex_algo == "karatsuba" else 4
    return 2 * B * M * N * K * mults


def scheme_flops(steps, complex_algo="naive"):
    total = 0
    for s in steps:
        lows = [s.lowered] if getattr(s, "lowered", None) is not None \
            else list(getattr(s, "lowered_chunks", ()) or ())
        for low in lows:
            total += step_flops(low, complex_algo)
    return total


def step_traffic_bytes(low, bytes_per_elem=4.0, split_components=2):
    """Minimum HBM bytes of one lowered step (read operands + write result),
    plus the reorder pass when the step carries one (gathers cost ~2x a
    streaming pass)."""
    from .lowering import _prod

    n_ops = _prod(low.shape_l) + _prod(low.shape_r) + _prod(low.phys_y)
    total = n_ops * bytes_per_elem * split_components
    if low.re_out is not None:
        extra = _prod(low.re_out.dims) * bytes_per_elem * split_components
        total += extra * (2 if low.re_out.mode == "transpose" else 4)
    return total


def scheme_roofline_seconds(steps, muladds_per_s=None, bytes_per_s=None,
                            complex_algo="naive"):
    """Per-slice wall-clock prediction from the LOWERED scheme: each step
    costs max(compute, traffic).  More faithful than the planner-tree
    roofline (it sees reorders and chunked gathers), but still blind to
    XLA-internal relayouts — treat as a lower bound and portfolio-rank by
    measurement for final plan selection (docs/BENCH_NOTES.md)."""
    from ..planner.cost import MXU_K_FULL, STEP_OVERHEAD_S, TPU_HBM_BYTES_PER_S
    from .lowering import _prod

    flops_rate = muladds_per_s or (28.6e12 / 2.0)   # real flops/s
    byte_rate = bytes_per_s or TPU_HBM_BYTES_PER_S
    total = 0.0
    for s in steps:
        if getattr(s, "lane", None) is not None:
            total += s.lane.est_s + STEP_OVERHEAD_S
            continue
        lows = [s.lowered] if getattr(s, "lowered", None) is not None \
            else list(getattr(s, "lowered_chunks", ()) or ())
        for low in lows:
            (cx, _cy), (bx, _by) = low.dnums
            k = _prod(low.shape_l[d] for d in cx)
            rate = flops_rate * min(1.0, k / MXU_K_FULL)
            total += max(step_flops(low, complex_algo) / rate,
                         step_traffic_bytes(low) / byte_rate) + STEP_OVERHEAD_S
    return total


def slice_dynamic_ids(steps, slicing_axes):
    """Buffer ids that VARY BY SLICE under the executor's slice vmap:
    seeded by the tensors slice_select touches, propagated through the
    scheme (a step's output is dynamic when either operand is)."""
    dyn = {tid for spec in slicing_axes for (tid, *_rest) in spec}
    for s in steps:
        if s.i in dyn or s.j in dyn:
            dyn.add(s.i)
    return dyn


def _peak_timeline(steps, slicing_axes=None, bytes_per_elem=4.0,
                   split_components=2):
    """(timeline, unit): per-program-point (dynamic_elems, static_elems)
    live+transient sets of a sparse/dense scheme, INCLUDING the
    aligned-gather and cross-merge temporaries the planner-tree mc is
    blind to (a round-3 portfolio candidate modeled 10 GB peak-mc but
    needed 57 GB once its gather temps materialized — docs/BENCH_NOTES.md).

    Tracks buffer sizes step by step: a buffer's initial size is its size
    at first use; a step's transient extra is the gathered operand copies
    plus all chunk outputs (live until the concat), or the pre-post_select
    output for cross merges.

    ``slicing_axes``: when given, operands that are SLICE-INVARIANT
    (slice_dynamic_ids) land in the static component — a GGK lane's
    W-side pre-arrangement of a folded gate block exists ONCE for the
    whole vmap width (round-4 unbatched-W fast path); without it,
    everything counts as dynamic (conservative)."""
    from .lowering import _prod

    dyn = None if slicing_axes is None else \
        slice_dynamic_ids(steps, slicing_axes)
    is_dyn = (lambda tid: True) if dyn is None else (lambda tid: tid in dyn)

    unit = bytes_per_elem * split_components

    def in_sizes(low):
        return _prod(low.shape_l), _prod(low.shape_r)

    # first-use size of every buffer (live from the start); a buffer is
    # width-SHARED when it is slice-invariant (vmap in_axes None: the
    # staged constant is not replicated per width instance)
    size = {}
    for s in steps:
        lows = [s.lowered] if getattr(s, "lowered", None) is not None \
            else list(getattr(s, "lowered_chunks", ()) or ())
        if not lows:
            continue
        if getattr(s, "gathers", None) is not None:
            # chunk operands are gathered rows OF the source buffers; the
            # source sizes are bounded by the total gathered rows
            tot_i = sum(_prod(low.shape_l) for low in lows)
            tot_j = sum(_prod(low.shape_r) for low in lows)
            size.setdefault(s.i, tot_i)
            size.setdefault(s.j, tot_j)
        else:
            a, b = in_sizes(lows[0])
            swapped = getattr(lows[0], "swapped", False)
            size.setdefault(s.i, b if swapped else a)
            size.setdefault(s.j, a if swapped else b)
    live = dict(size)
    # (dynamic_elems, static_elems) live+transient at each program point
    timeline = [(sum(v for t, v in size.items() if is_dyn(t)),
                 sum(v for t, v in size.items() if not is_dyn(t)))]
    for s in steps:
        lows = [s.lowered] if getattr(s, "lowered", None) is not None \
            else list(getattr(s, "lowered_chunks", ()) or ())
        if not lows:
            continue
        out = sum(_prod(low.phys_y) for low in lows)
        out_dyn = is_dyn(s.i) or is_dyn(s.j)
        extra_d = extra_s = 0
        lane = getattr(s, "lane", None)
        if getattr(s, "gathers", None) is not None and lane is None:
            # gathered operand copies of the current chunk + every chunk
            # output held until the final concat (a GGK lane fuses the
            # gathers: no copies, no chunk outputs); a static operand's
            # gathered copy is itself static (batch rows, not slice rows)
            gi = max(_prod(low.shape_l) for low in lows)
            gj = max(_prod(low.shape_r) for low in lows)
            swapped = getattr(lows[0], "swapped", False)
            di, dj = (is_dyn(s.j), is_dyn(s.i)) if swapped \
                else (is_dyn(s.i), is_dyn(s.j))
            extra_d += (gi if di else 0) + (gj if dj else 0)
            extra_s += (0 if di else gi) + (0 if dj else gj)
            if out_dyn:
                extra_d += out
            else:
                extra_s += out
        elif lane is not None and hasattr(lane, "bj_rows"):
            # GGK lane, TWO program points (the round-4 single point
            # summed them, overcharging sc22_r2 @ w128 by 1.27x vs XLA's
            # real buffer assignment — mem_analysis 12.45 GiB vs the
            # 15.82 modeled, VERDICT r4 item 4):
            #   A  kernel executes: inputs + W-side take (+ pre-reorder
            #      X copy) + kernel output coexist;
            #   B  the measured XLA relayout copy of the pallas output
            #      (sc22_r2 10k w32 OOM: output + copy + takes) runs
            #      AFTER the kernel, when both consumed operands and the
            #      wk take are already dead — out + copy coexist with
            #      the REMAINING live set only.
            # A SLICE-INVARIANT W (folded gate block) is gathered once
            # for the whole vmap width — width-shared.
            row = lane.row
            w_id = s.j if row.w_is_j else s.i
            x_id = s.i if row.w_is_j else s.j
            wk = lane.bj_rows * row.H * row.K
            if is_dyn(w_id):
                extra_d += wk
            else:
                extra_s += wk
            ld = sum(v for t, v in live.items() if is_dyn(t))
            ls = sum(v for t, v in live.items() if not is_dyn(t))
            dead_d = sum(live.get(t, 0) for t in {s.i, s.j} if is_dyn(t))
            dead_s = sum(live.get(t, 0) for t in {s.i, s.j}
                         if not is_dyn(t))
            if getattr(row, "pre_perm", None) is not None:
                # pre-reorder sub-phase: source X and its permuted copy
                # coexist (no kernel buffers yet); the source dies
                # before the kernel runs, so the kernel point below
                # carries the copy at the source's ledger slot (same
                # element count up to _rg_pad padding — charge the
                # padded copy, drop the source).  The relayout point
                # (B) then frees the COPY, not the source.
                pre = lane.bi_rows * _prod(row.view_x)
                src = live.get(x_id, 0)
                if is_dyn(x_id):
                    timeline.append((ld + pre, ls))
                    ld += pre - src
                    dead_d += pre - src
                else:
                    timeline.append((ld, ls + pre))
                    ls += pre - src
                    dead_s += pre - src
            timeline.append((ld + (out if out_dyn else 0) + extra_d,
                             ls + (0 if out_dyn else out) + extra_s))
            timeline.append((ld - dead_d + 2 * (out if out_dyn else 0),
                             ls - dead_s + 2 * (0 if out_dyn else out)))
            live[s.i] = out
            live[s.j] = 0
            continue
        elif lane is not None and getattr(lane, "pre", None) is not None:
            # GK lane with an explicit pre-reorder: the permuted X copy
            # coexists with the source during the transpose and with the
            # kernel afterwards (the source may die, but XLA's fused
            # copy chains keep both transiently — charge the copy)
            x_id = s.i if getattr(lane, "w_is_j", True) else s.j
            pre_elems = _prod(lane.pre.dims)
            if is_dyn(x_id):
                extra_d += pre_elems
            else:
                extra_s += pre_elems
        elif getattr(s, "post_select", None) is not None:
            if out_dyn:           # pre-selection output + selected copy
                extra_d += out
            else:
                extra_s += out
        ld = sum(v for t, v in live.items() if is_dyn(t))
        ls = sum(v for t, v in live.items() if not is_dyn(t))
        timeline.append((ld + (out if out_dyn else 0) + extra_d,
                         ls + (0 if out_dyn else out) + extra_s))
        live[s.i] = out
        live[s.j] = 0
    return timeline, unit


def scheme_peak_live_bytes(steps, bytes_per_elem=4.0, split_components=2,
                           slicing_axes=None):
    """Per-slice peak HBM live set (see _peak_timeline)."""
    timeline, unit = _peak_timeline(steps, slicing_axes, bytes_per_elem,
                                    split_components)
    return max(d + st for d, st in timeline) * unit


def scheme_peak_bytes_at_width(steps, width, slicing_axes,
                               bytes_per_elem=4.0, split_components=2):
    """TOTAL peak HBM bytes when ``width`` slices run vmapped: dynamic
    (slice-varying) live sets replicate per width instance, slice-
    invariant buffers are shared.  Exact per-timeline-point, so tighter
    than width * per-slice peak (which overcharged the sc22_r2 w128
    config by ~25% and forced the hard-coded width table, VERDICT r3)."""
    timeline, unit = _peak_timeline(steps, slicing_axes, bytes_per_elem,
                                    split_components)
    return max(width * d + st for d, st in timeline) * unit


# Measured round 3 (trace profile, docs/BENCH_NOTES.md): XLA fallback
# steps run at ~2.2x their fused-minimum traffic — the dot's operand
# layout-normalization copies and the 4-dot re/im combine passes are
# extra full passes over the data that the lowered-step model cannot see.
XLA_RELAYOUT_FACTOR = 2.2

# Optional measured calibration (scripts/fit_calibration.py writes
# artensor_tpu/calibration.json from width-sweep data).  Identity
# defaults reproduce the uncalibrated model exactly:
#   per_slice = kern_factor*kern_s + xla_factor*xla_s
#               + byte_factor*bytes_per_slice/HBM
#   total     = n_slices*(per_slice + n_steps*step_overhead_w1_s/width)
_CALIBRATION = None


def load_calibration(path=None, refresh=False):
    """Load (and cache) the measured estimator calibration, if any."""
    global _CALIBRATION
    if _CALIBRATION is not None and not refresh:
        return _CALIBRATION
    import json
    import os
    path = path or os.environ.get("ARTENSOR_TPU_CALIBRATION") or \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "calibration.json")
    cal = {"kern_factor": 1.0, "xla_factor": 1.0, "byte_factor": 0.0,
           "step_overhead_w1_s": None}
    if os.path.exists(path):
        with open(path) as f:
            cal.update(json.load(f))
    _CALIBRATION = cal
    return cal


def step_overhead_bytes(s, lows):
    """HBM bytes the step pays AROUND its dots: gather materializations,
    chunk concats, cross post-selects.  The round-3 width sweeps showed
    gather/cross-heavy schemes run ~4x their dot-only model while the
    committed (plain-GK) scheme matches at 1.07x — the difference is
    exactly these passes, which the per-Lowered model cannot see:

    - aligned gathers: ``take`` reads the source rows AND writes a gathered
      copy, which the einsum then re-reads -> 2 extra passes over each
      gathered operand (per chunk);
    - chunked merges: the per-chunk outputs are written, then the concat
      copies them (read + write) -> 2 extra passes over the output;
    - cross post_select: the full cross output is written, then the row
      select reads it and writes the kept rows -> one pass over the
      pre-select output plus one over the selection.
    """
    from .lowering import _prod

    unit = 4.0 * 2  # f32 split pair
    extra = 0.0
    if getattr(s, "gathers", None) is not None:
        for low in lows:
            extra += 2 * unit * (_prod(low.shape_l) + _prod(low.shape_r))
        if len(lows) > 1:
            extra += 2 * unit * sum(_prod(low.phys_y) for low in lows)
    if getattr(s, "post_select", None) is not None:
        y_pre = sum(_prod(low.phys_y) for low in lows)
        rows = s.reshape[0] if s.reshape else y_pre   # merged batch rows
        row_elems = y_pre // max(1, rows)
        extra += unit * (y_pre + len(s.post_select) * row_elems)
    return extra


def scheme_wall_components(steps):
    """Decompose the per-slice model: (kern_s, xla_s, bytes_per_slice,
    n_steps).  ``bytes_per_slice`` counts every step's fused-minimum
    traffic (kernel steps too) — the regressor for the measured
    size-proportional gap the base model misses."""
    from ..planner.cost import MXU_K_FULL, TPU_HBM_BYTES_PER_S
    from .lowering import _prod

    flops_rate = 28.6e12 / 2.0
    kern_s = xla_s = bytes_ps = 0.0
    n_steps = 0
    for s in steps:
        n_steps += 1
        lows = [s.lowered] if getattr(s, "lowered", None) is not None \
            else list(getattr(s, "lowered_chunks", ()) or ())
        for low in lows:
            bytes_ps += step_traffic_bytes(low)
        # the gather/concat/select passes run on XLA regardless of how the
        # dot itself executes — charge them to the xla bucket even when
        # the step's contraction runs on a kernel.  Exception: a GGK lane
        # on an aligned step FUSES the gathers and removes the chunking,
        # so nothing surrounds the kernel there.
        ggk_fused = getattr(s, "gathers", None) is not None \
            and getattr(s, "lane", None) is not None
        over = 0.0 if ggk_fused else step_overhead_bytes(s, lows)
        bytes_ps += over
        xla_s += over / TPU_HBM_BYTES_PER_S
        if getattr(s, "lane", None) is not None:
            kern_s += s.lane.est_s
            continue
        for low in lows:
            (cx, _cy), (bx, _by) = low.dnums
            k = _prod(low.shape_l[d] for d in cx)
            rate = flops_rate * min(1.0, k / MXU_K_FULL)
            xla_s += max(
                step_flops(low) / rate,
                step_traffic_bytes(low) * XLA_RELAYOUT_FACTOR
                / TPU_HBM_BYTES_PER_S)
    return kern_s, xla_s, bytes_ps, n_steps


def scheme_wall_estimate(steps, k_sliced,
                         xla_traffic_factor=XLA_RELAYOUT_FACTOR,
                         hbm_budget_bytes=None, slicing_axes=None):
    """Calibrated end-to-end wall-clock estimate for ranking plan
    portfolios: per-slice step costs (kernel est_s where planned; XLA
    fallback traffic inflated by the measured relayout factor) plus the
    per-step fixed overhead amortized by the slice-vmap width the TEMP-
    AWARE peak live set allows.  When a measured calibration file exists
    (load_calibration), its fitted factors rescale the components.
    Returns (seconds, width, peak_bytes)."""
    from ..planner.cost import (HBM_BUDGET_BYTES, STEP_OVERHEAD_W1_S,
                                TPU_HBM_BYTES_PER_S)

    budget = hbm_budget_bytes or HBM_BUDGET_BYTES
    cal = load_calibration()
    kern_s, xla_s, bytes_ps, n_steps = scheme_wall_components(steps)
    if xla_traffic_factor != XLA_RELAYOUT_FACTOR:
        xla_s *= xla_traffic_factor / XLA_RELAYOUT_FACTOR
    per_slice = (cal["kern_factor"] * kern_s + cal["xla_factor"] * xla_s
                 + cal["byte_factor"] * bytes_ps / TPU_HBM_BYTES_PER_S)
    overhead_w1 = cal["step_overhead_w1_s"] or STEP_OVERHEAD_W1_S
    peak = scheme_peak_live_bytes(steps, slicing_axes=slicing_axes)
    n_slices = 2 ** k_sliced
    width = 1
    while (width < min(256, n_slices)
           and scheme_peak_bytes_at_width(steps, width * 2, slicing_axes)
           <= budget):
        width *= 2
    total = n_slices * (per_slice + n_steps * overhead_w1 / width)
    return total, width, peak


# Per-segment dispatch cost of segmented execution on the TUNNELED chip
# (host builds + ships one program invocation per segment per batch).
# Measured by the segment_steps=64-vs-128 A/B at width 2 on the n53 sc24
# scheme (scripts/n53_segment_bench.py, docs/BENCH_NOTES.md round 5).
SEGMENT_DISPATCH_S = 0.15


def segmented_wall_estimate(steps, n_slices, width, segment_steps=64,
                            dispatch_s=None):
    """Forced end-to-end wall estimate for SEGMENTED execution: the
    calibrated per-slice device cost (scheme_wall_components — same
    model as the monolithic estimate) plus the per-segment dispatch
    the segmented host loop pays on every batch.  The dispatch term is
    what the monolithic estimate does not have — one XLA program has
    zero inter-step dispatch; a segmented scheme pays ~SEGMENT_DISPATCH_S
    per segment per batch over the tunnel.  ``steps`` must be the list
    the executor actually walks (post static folding).  Returns
    (total_seconds, per_slice_device_s, n_segments)."""
    import math

    from ..planner.cost import TPU_HBM_BYTES_PER_S

    cal = load_calibration()
    kern_s, xla_s, bytes_ps, n_steps = scheme_wall_components(steps)
    per_slice = (cal["kern_factor"] * kern_s + cal["xla_factor"] * xla_s
                 + cal["byte_factor"] * bytes_ps / TPU_HBM_BYTES_PER_S)
    n_seg = math.ceil(n_steps / segment_steps)
    d = SEGMENT_DISPATCH_S if dispatch_s is None else dispatch_s
    width = max(1, width)
    n_batches = math.ceil(n_slices / width)
    total = n_batches * (width * per_slice + n_seg * d)
    return total, per_slice, n_seg


def max_safe_slice_batch(steps, requested, hbm_budget_bytes=None,
                         slicing_axes=None):
    """Largest power-of-two slice-vmap width <= ``requested`` whose
    TEMP-AWARE peak live set (scheme_peak_live_bytes — gather copies, GGK
    pre-arrangements, chunk outputs included) fits the HBM budget.

    Round 3 left segmented callers free to pick any width, reproducing
    the GGK-temp HBM-peak OOM class the monolithic path already guards
    (n53 `N53_LANES=1` at slice-batch 4 — VERDICT r3 weak #4); every
    width decision now routes through this audit."""
    from ..planner.cost import HBM_BUDGET_BYTES

    budget = hbm_budget_bytes or HBM_BUDGET_BYTES
    w = 1
    while (w < requested
           and scheme_peak_bytes_at_width(steps, w * 2, slicing_axes)
           <= budget):
        w *= 2
    return max(1, min(requested, w))


def choose_slice_width(steps, k_sliced, slicing_axes=None, cap=128,
                       hbm_budget_bytes=None):
    """The library's slice-vmap width choice: the calibrated wall
    estimate's width (exact at-width HBM peak — dynamic live sets
    replicate per instance, slice-invariant buffers are shared), capped.

    No kernel-form re-decision is needed at the chosen width: the
    round-4 advisor's width-screen regression class died with the RGBlk
    form that created it (its padded-W take was the only width-scaled
    gather temp; the form measured slower than the RGRow kernel it
    replaced in every committed config and was removed — BENCH_NOTES
    round 5)."""
    _, w_est, _ = scheme_wall_estimate(
        steps, k_sliced, slicing_axes=slicing_axes,
        hbm_budget_bytes=hbm_budget_bytes)
    return max(1, min(cap, w_est))


def reorder_census(steps):
    census = {"none": 0, "transpose": 0, "gather": 0}
    for s in steps:
        lows = [s.lowered] if getattr(s, "lowered", None) is not None \
            else list(getattr(s, "lowered_chunks", ()) or ())
        for low in lows:
            census[low.re_out.mode if low.re_out else "none"] += 1
    return census


@dataclass
class ContractionReport:
    """Filled by TensorNetworkSimulation.contraction(report=True)."""

    predicted_flops: float = 0.0       # per full contraction (all slices)
    wall_s: float = 0.0
    compile_s: float = 0.0
    num_slices: int = 1
    num_steps: int = 0
    reorders: dict = field(default_factory=dict)
    tc: float = 0.0                    # planner log10 per-slice mul-adds
    sc: float = 0.0

    @property
    def tflops(self):
        return self.predicted_flops / self.wall_s / 1e12 if self.wall_s else 0.0

    def summary(self):
        return (f"{self.num_steps} steps x {self.num_slices} slices, "
                f"predicted {self.predicted_flops:.3e} flops, wall "
                f"{self.wall_s:.3f}s ({self.tflops:.2f} TFLOP/s), "
                f"compile {self.compile_s:.1f}s, reorders {self.reorders}")


class Timer:
    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.t0
