"""Lane-scheduled Pallas execution of contraction steps.

The measured bottleneck of the XLA multi-dim dot path is NOT bandwidth: hot
steps contract only K in {8..32} bond values, so the 128x128 MXU runs at
K/128 <= 25% utilization, and XLA adds full-buffer relayout copies plus
separate re/im combine passes (profile: 0.75s copies + 0.59s combines +
0.75s dots of the 2.19s n30 benchmark).

The lane discipline attacks all three at once.  Every tensor is flat with
a known LEG ORDER (always true in this runtime); this module additionally
CHOOSES each step's output leg order so that the *consumer's* contract
legs sit in the LEADING ("lane") legs.  A step whose big operand X has its
contract legs lane-resident becomes

    one (H, L<=256) x (L, rows) real matmul per re/im product,

a full-MXU K=L dot: the small operand W is expanded (by a tiny traced
gather) into a block-diagonal "lane matrix" WpT that contracts the
lane-resident bond values while PRESERVING lane-resident free legs
(block-diagonal over them), and re/im are combined in VMEM inside one
Pallas kernel — X is read from HBM exactly once, the output written
exactly once, and no relayout copies are possible (the kernel pins
layouts).  Measured on the dominant n30 step shape: 12.7 ms (XLA
multi-dim dots) -> 2.1 ms (fused lane kernel, 512 GB/s effective).

Lanes are the LEADING legs (not trailing) deliberately: delivering a
lane-friendly layout sometimes needs an explicit reorder on the producing
step, and a move-legs-to-FRONT permutation keeps the buffer's minor run
intact (large contiguous transfers on both sides), whereas moving small
dim-2 legs to the back degenerates into 4-byte-granular scatters.

Contract legs still in X's ROWS are handled by a static combo loop
(<= COMBO_CAP index combinations, each a VMEM slice + accumulated dot).
Steps that do not fit (both operands big, amplitude-batch axes, chunked
gathers, oversized Wp) fall back to the existing multi-dim dot_general
lowering — the representation (flat buffer + leg order) is identical, so
both paths mix freely inside one scheme.

No reference analogue: /root/reference executes one torch.einsum per step
(artensor/contraction.py:62-76); layout scheduling and MXU lane packing
are TPU-specific design.
"""

from dataclasses import dataclass
from functools import partial, reduce
from operator import mul

import numpy as np

LANE_CAP = 256        # max lane-leg product of the big operand
H_CAP = 512           # max output lane product (block-diag free x N)
COMBO_CAP = 16        # max row-contract index combinations
WP_ELEMS_CAP = 1 << 18   # max elements of the expanded lane matrix (VMEM)
MIN_X_ELEMS = 1 << 16    # below this, XLA overhead is irrelevant: fall back
SMALL_W_ELEMS = 1 << 13  # "small operand" bound
BLOCK_ELEMS = 1 << 18    # target X-block elements per kernel program

# chip envelope (measured, one v5e core): dense f32 HIGHEST matmul rate and
# the streaming rate the lane kernel itself achieves.  A lane plan is only
# kept when its (padded) MXU work stays within ROOFLINE_SLACK of its HBM
# time — low-L plans waste MXU work on K-padding and the block-diagonal
# and would run SLOWER than the XLA fallback.
MXU_FLOPS_PER_S = 28.6e12
HBM_BYTES_PER_S = 450e9
ROOFLINE_SLACK = 2.5


def _prod(xs):
    return reduce(mul, xs, 1)


def _leading_splits(ix_x, dim_of):
    """Candidate lane splits: (count, L) per leading-leg prefix with
    product <= LANE_CAP."""
    out = []
    L = 1
    for k, l in enumerate(ix_x):
        L *= dim_of[l]
        if L > LANE_CAP:
            break
        out.append((k + 1, L))
    return out


def _split_big_small(ix_i, ix_j, dims_i, dims_j):
    if _prod(dims_i) >= _prod(dims_j):
        return True, ix_i, dims_i, ix_j, dims_j
    return False, ix_j, dims_j, ix_i, dims_i


def fallback_output_order(ix_i, ix_j, iy_set, dims_i, dims_j,
                          consumer_contract=()):
    """Output order for steps that execute on the XLA path.

    Unconstrained by the kernel's lane/row structure, so ALL of the
    consumer's contract legs go to the leading end (any reorder this
    forces on the current step is a streamed row-permutation with the
    minor run intact; it buys the consumer a full-width lane-K kernel).
    Base order is the transpose-free natural one, so steps with no
    consumer hint stay reorder-free.
    """
    from .lowering import preferred_output_order

    base = preferred_output_order(ix_i, ix_j, iy_set, dims_i, dims_j)
    cset = set(consumer_contract)
    return tuple([l for l in base if l in cset]
                 + [l for l in base if l not in cset])


@dataclass(frozen=True)
class LanePlan:
    """Static metadata for one Pallas-executed step."""

    w_is_j: bool
    view_x: tuple        # X view: leading L + rows axes (trailing run last)
    combo_axes: tuple    # indices into view_x of looped row-contract legs
    x_axes: tuple        # per rows-axis: ('c', leg)|('g', leg)|('f', None)
    y_axes: tuple        # output axes in iy order: ('g', leg)|('H',)|('f',)
    block: int           # block size along the trailing free run
    L: int
    H: int
    n_combos: int
    wp_idx: object       # (n_combos, H, L) int32 numpy gather into w_flat
    wp_sign: object      # (n_combos, H, L) float32 mask
    view_y: tuple        # output: leading H + non-combo rows axes
    dims_y: tuple        # logical output dims (iy order)
    flops: int           # real flops (4-dot naive) for cost reporting
    est_s: float         # roofline estimate (ranks candidate splits)


def plan_lane_step(ix_i, ix_j, iy, dims_i, dims_j, lane_count=None, pin=0):
    """Build a LanePlan for the step, or None if ineligible.

    ``lane_count`` pins the lane split (the run of X legs after the first
    ``pin`` pinned legs); default tries every split and keeps the one with
    the best roofline estimate.  ``pin`` leading X legs (e.g. a sparse
    amplitude-batch axis) stay leading grid legs in the output.
    """
    if lane_count is None:
        best = None
        _b, ix_x0, dims_x0, _w, _dw = _split_big_small(
            ix_i, ix_j, dims_i, dims_j)
        dox = {l: int(d) for l, d in zip(ix_x0, dims_x0)}
        for k, _L in _leading_splits(ix_x0[pin:], dox):
            p = plan_lane_step(ix_i, ix_j, iy, dims_i, dims_j,
                               lane_count=k, pin=pin)
            if p is not None and (best is None or p.est_s < best.est_s):
                best = p
        return best
    # w_is_j True <=> operand i is the big X side and j is the small W side
    w_is_j, ix_x, dims_x, ix_w, dims_w = _split_big_small(
        ix_i, ix_j, dims_i, dims_j)
    if _prod(dims_x) < MIN_X_ELEMS or _prod(dims_w) > SMALL_W_ELEMS:
        return None
    set_x, set_w, set_y = set(ix_x), set(ix_w), set(iy)
    if set_x & set_w & set_y:
        return None  # shared batch-like labels: fall back
    contract = [l for l in ix_x if l in set_w and l not in set_y]
    n_legs = [l for l in ix_w if l in set_y]
    if set(ix_w) != set(contract) | set(n_legs) or len(set_y) != len(iy):
        return None
    dim_of = {}
    for l, d in zip(ix_x, dims_x):
        dim_of[l] = int(d)
    for l, d in zip(ix_w, dims_w):
        dim_of[l] = int(d)

    pinned = list(ix_x[:pin])
    if any(l not in set_y for l in pinned):
        return None
    lane_legs = list(ix_x[pin:pin + lane_count])
    L = _prod(dim_of[l] for l in lane_legs)
    if L > LANE_CAP:
        return None
    lane_set = set(lane_legs)
    row_legs = [l for l in ix_x if l not in lane_set]
    combo_legs = [l for l in row_legs if l in contract]
    n_combos = _prod(dim_of[l] for l in combo_legs)
    if n_combos > COMBO_CAP:
        return None
    lane_free = [l for l in lane_legs if l not in contract]
    rows_free = [l for l in row_legs if l not in contract]
    H = _prod(dim_of[l] for l in lane_free) * _prod(dim_of[l] for l in n_legs)
    if H > H_CAP or n_combos * L * H > WP_ELEMS_CAP:
        return None
    # iy must be a permutation of lane_free+new, then rows_free in order
    if len(rows_free) and tuple(iy[-len(rows_free):]) != tuple(rows_free):
        return None
    h_legs = list(iy[:len(iy) - len(rows_free)])
    if set(h_legs) != set(lane_free) | set(n_legs):
        return None

    # roofline gate: padded MXU time must not dominate the stream time
    rows_total = _prod(dim_of[l] for l in rows_free)
    x_elems = _prod(dims_x)
    compute_s = (4 * 2 * rows_total * max(L, 128) * max(H, 128) * n_combos
                 / MXU_FLOPS_PER_S)
    traffic_s = 4 * (2 * x_elems + 2 * rows_total * H
                     + 2 * n_combos * L * H) / HBM_BYTES_PER_S
    if compute_s > ROOFLINE_SLACK * traffic_s:
        return None
    est_s = max(compute_s, traffic_s)

    # ---- wpT gather construction (host, numpy) --------------------------
    lane_c = [l for l in lane_legs if l in contract]
    w_strides = {}
    s = 1
    for l in reversed(ix_w):
        w_strides[l] = s
        s *= dim_of[l]

    def _digits(idx_arr, dims):
        out = []
        rem = idx_arr
        for d in reversed(dims):
            out.append(rem % d)
            rem = rem // d
        out.reverse()
        return out

    li = np.arange(L, dtype=np.int64)
    lane_vals = dict(zip(lane_legs,
                         _digits(li, [dim_of[l] for l in lane_legs]))) \
        if lane_legs else {}
    hi = np.arange(H, dtype=np.int64)
    h_vals = dict(zip(h_legs, _digits(hi, [dim_of[l] for l in h_legs]))) \
        if h_legs else {}
    ci = np.arange(max(n_combos, 1), dtype=np.int64)
    combo_vals = dict(zip(combo_legs,
                          _digits(ci, [dim_of[l] for l in combo_legs]))) \
        if combo_legs else {}

    idx = np.zeros((n_combos, H, L), dtype=np.int64)
    mask = np.ones((n_combos, H, L), dtype=np.float32)
    for l in lane_c:
        idx += lane_vals[l][None, None, :] * w_strides[l]
    for l in combo_legs:
        idx += combo_vals[l][:, None, None] * w_strides[l]
    for l in n_legs:
        idx += h_vals[l][None, :, None] * w_strides[l]
    for l in lane_free:
        mask = mask * (lane_vals[l][None, None, :]
                       == h_vals[l][None, :, None]).astype(np.float32)

    # ---- view / blocking -------------------------------------------------
    # Kernel values must stay 2-D (L, block) — Mosaic cannot merge dims
    # across the lane boundary.  The trailing free run of X becomes the
    # blocked axis; every OTHER row leg is either a combo leg (full in
    # block, statically indexed in-kernel) or a GRID leg (block 1).  Grid
    # legs can be placed ANYWHERE in the output order by the out index
    # map — that is how the consumer's contract legs get hoisted to the
    # leading end even when they live in X's rows.
    combo_set = set(combo_legs)
    # non-pinned row legs after the lane run; trailing free run = the
    # contiguous free legs at the very end of X
    rest_rows = [l for l in row_legs if l not in set(pinned)]
    # the trail = longest suffix of X's rows kept in place by iy (free
    # legs only; stops naturally at combo legs, which never appear in iy)
    n_trail = 0
    while (n_trail < len(rest_rows) and n_trail < len(iy)
           and iy[-(n_trail + 1)] == rest_rows[-(n_trail + 1)]
           and rest_rows[-(n_trail + 1)] not in combo_set):
        n_trail += 1
    trail_legs = rest_rows[len(rest_rows) - n_trail:] if n_trail else []
    F = _prod(dim_of[l] for l in trail_legs)
    grid_legs = pinned + [l for l in rest_rows
                          if l not in combo_set and l not in set(trail_legs)]
    if F < 128 and (grid_legs or combo_legs):
        return None   # tiny inner blocks: DMA-inefficient, keep on XLA
    # iy structure: pinned legs first; then any permutation of
    # (grid_legs + h) with h's legs CONTIGUOUS; trail_legs last in order.
    if tuple(iy[:pin]) != tuple(pinned):
        return None
    if n_trail and tuple(iy[-n_trail:]) != tuple(trail_legs):
        return None
    head = list(iy[:len(iy) - n_trail])
    h_set = set(h_legs)
    h_pos = [k for k, l in enumerate(head) if l in h_set]
    if h_pos and h_pos[-1] - h_pos[0] + 1 != len(h_pos):
        return None
    if set(head) - h_set != set(grid_legs):
        return None
    # output view in iy order: ('g', leg) | ('H',) | ('f',)
    y_axes = []
    placed_h = False
    for l in head:
        if l in h_set:
            if not placed_h:
                y_axes.append(("H", None))
                placed_h = True
        else:
            y_axes.append(("g", l))
    if not placed_h:
        y_axes.append(("H", None))
    y_axes.append(("f", None))
    # x view in storage order: pinned g's, the lane run ('L'), then rows
    x_axes = [("g", l) for l in pinned] + [("L", None)]
    for l in rest_rows[:len(rest_rows) - n_trail]:
        x_axes.append(("c" if l in combo_set else "g", l))
    x_axes.append(("f", None))
    inner_budget = max(1, BLOCK_ELEMS // max(n_combos * L, 1))
    block = max(1, min(F, inner_budget))
    while F % block:
        block -= 1
    def _xdim(kind, l):
        if kind == "L":
            return L
        if kind == "f":
            return F
        return dim_of[l]
    view_dims = tuple(_xdim(kind, l) for kind, l in x_axes)
    combo_axes = tuple(k for k, (kind, l) in enumerate(x_axes)
                       if kind == "c")
    view_y = tuple(H if kind == "H" else (F if kind == "f" else dim_of[l])
                   for kind, l in y_axes)
    dims_y = tuple(dim_of[l] for l in iy)
    flops = 4 * 2 * rows_total * L * H * n_combos
    return LanePlan(w_is_j, view_dims, combo_axes, tuple(x_axes),
                    tuple(y_axes), block, L, H, n_combos,
                    idx.astype(np.int32), mask, view_y, dims_y, flops, est_s)


def schedule_step(ix_i, ix_j, iy_set, dims_i, dims_j, consumer_contract=(),
                  pin=0):
    """Choose the step's output order and (when feasible) its LanePlan.

    For every leading-leg split of the big operand, builds the candidate
    output order (X's remaining lane-free legs and W's new legs first —
    the CONSUMER's contract legs leading — then rows in storage order) and
    keeps the feasible plan with the best roofline estimate.  When no
    split is feasible the step runs on the XLA path with full order
    freedom — all consumer-contract legs leading (fallback_output_order).

    Returns (iy, plan_or_None).
    """
    w_is_j, ix_x, dims_x, ix_w, dims_w = _split_big_small(
        ix_i, ix_j, dims_i, dims_j)
    set_x, set_w = set(ix_x), set(ix_w)
    dim_of = {}
    for l, d in zip(ix_x, dims_x):
        dim_of[l] = int(d)
    for l, d in zip(ix_w, dims_w):
        dim_of[l] = int(d)
    new = [l for l in ix_w if l in iy_set and l not in set_x]
    cset = set(consumer_contract)
    best = None
    if (_prod(dims_x) >= MIN_X_ELEMS and _prod(dims_w) <= SMALL_W_ELEMS
            and not (set_x & set_w & iy_set)):
        contract_set = {l for l in ix_x if l in set_w and l not in iy_set}
        pinned = list(ix_x[:pin])
        for k, _L in _leading_splits(ix_x[pin:], dim_of):
            lane_legs = list(ix_x[pin:pin + k])
            lane_set = set(lane_legs)
            row_legs = [l for l in ix_x[pin:] if l not in lane_set]
            rows_free = [l for l in row_legs if l in iy_set
                         and l not in set_w]
            lane_free = [l for l in lane_legs
                         if l in iy_set and l not in set_w]
            # trailing free run stays at the end; everything else is a
            # grid leg the kernel can place freely — hoist the consumer's
            # contract legs (h-part AND row-part) to the leading end
            # NB: consumer-contract legs inside the trailing run stay put
            # — hoisting a leg that is MINOR to the main free run would
            # degrade the kernel's DMA to 4-byte-granular reads.  Those
            # legs are delivered by the XLA fallback path instead.
            n_trail = 0
            for l in reversed(row_legs):
                if l in contract_set:
                    break
                n_trail += 1
            trail = row_legs[len(row_legs) - n_trail:] if n_trail else []
            gables = [l for l in rows_free if l not in set(trail)]
            h = [l for l in lane_free + new if l in cset]
            h += [l for l in lane_free + new if l not in cset]
            head = [l for l in gables if l in cset] + h
            rest = [l for l in gables if l not in cset]
            iy_k = tuple(pinned + head + rest + trail)
            p = plan_lane_step(ix_i, ix_j, iy_k, dims_i, dims_j,
                               lane_count=k, pin=pin)
            if p is not None and (best is None or p.est_s < best[1].est_s):
                best = (iy_k, p)
    if best is not None:
        return best
    return fallback_output_order(ix_i, ix_j, iy_set, dims_i, dims_j,
                                 consumer_contract), None


# -- execution -------------------------------------------------------------

def _build_wp(w_flat, plan):
    """(n_combos, H, L) lane matrix from the flat W payload (traced, tiny)."""
    import jax.numpy as jnp

    idx = jnp.asarray(plan.wp_idx)
    sign = jnp.asarray(plan.wp_sign)
    return jnp.take(w_flat.reshape((-1,)), idx) * sign


def _kernel(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref, *, plan):
    import jax.numpy as jnp
    from jax import lax

    dot = partial(lax.dot_general,
                  dimension_numbers=(((1,), (0,)), ((), ())),
                  precision=lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    re = im = None
    for c in range(plan.n_combos):
        digits = []
        rem = c
        for k in reversed(plan.combo_axes):
            d = plan.view_x[k]
            digits.append(rem % d)
            rem //= d
        digits.reverse()
        idx = (slice(None), *digits, slice(None))
        vr = xr_ref[idx]          # (L, block)
        vi = xi_ref[idx]
        wr = wr_ref[c]            # (H, L)
        wi = wi_ref[c]
        a, b = dot(wr, vr), dot(wi, vi)
        cc, d2 = dot(wi, vr), dot(wr, vi)
        re = a - b if re is None else re + (a - b)
        im = cc + d2 if im is None else im + (cc + d2)
    or_ref[...] = re
    oi_ref[...] = im


def apply_lane_step(field, x, y, plan, interpret=None):
    """Execute one lane-planned step on SplitField pairs (traceable)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .lowering import physical_shape

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xv, wv = (x, y) if plan.w_is_j else (y, x)
    wr = _build_wp(wv[0], plan)
    wi = _build_wp(wv[1], plan)
    xr = xv[0].reshape(plan.view_x)
    xi = xv[1].reshape(plan.view_x)

    F = plan.view_x[-1]
    # grid: one axis per 'g' (hoisted/placed/pinned) leg, then the F blocks
    g_legs = [l for kind, l in plan.x_axes if kind == "g"]
    g_pos = {l: k for k, l in enumerate(g_legs)}
    grid = tuple(plan.view_x[k]
                 for k, (kind, l) in enumerate(plan.x_axes)
                 if kind == "g") + (F // plan.block,)

    # x block: 'c'/'L' axes full, 'g' axes squeezed (None), 'f' blocked
    xblock = []
    for k, (kind, l) in enumerate(plan.x_axes):
        if kind in ("c", "L"):
            xblock.append(plan.view_x[k])
        elif kind == "g":
            xblock.append(None)
        else:
            xblock.append(plan.block)

    def x_index(*gids):
        out = []
        for kind, l in plan.x_axes:
            if kind in ("c", "L"):
                out.append(0)
            elif kind == "g":
                out.append(gids[g_pos[l]])
            else:
                out.append(gids[-1])
        return tuple(out)

    # y block: 'g' axes squeezed, 'H' full, 'f' blocked — the index map
    # places each hoisted leg wherever iy put it (block-level permutation)
    yblock = []
    for kind, l in plan.y_axes:
        if kind == "g":
            yblock.append(None)
        elif kind == "H":
            yblock.append(plan.H)
        else:
            yblock.append(plan.block)

    def y_index(*gids):
        out = []
        for kind, l in plan.y_axes:
            if kind == "g":
                out.append(gids[g_pos[l]])
            elif kind == "H":
                out.append(0)
            else:
                out.append(gids[-1])
        return tuple(out)

    wspec = pl.BlockSpec((plan.n_combos, plan.H, plan.L),
                         lambda *g: (0, 0, 0), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec(tuple(xblock), x_index, memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec(tuple(yblock), y_index, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(plan.view_y, jnp.float32)
    traffic = 4 * (2 * _prod(plan.view_x) + 2 * _prod(plan.view_y)
                   + 2 * plan.n_combos * plan.L * plan.H)
    yr, yi = pl.pallas_call(
        partial(_kernel, plan=plan),
        grid=grid,
        in_specs=[xspec, xspec, wspec, wspec],
        out_specs=(yspec, yspec),
        out_shape=(out_shape, out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=plan.flops, bytes_accessed=traffic, transcendentals=0),
        interpret=interpret,
    )(xr, xi, wr, wi)
    return field.reshape((yr, yi), physical_shape(plan.dims_y))
