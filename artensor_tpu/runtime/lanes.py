"""Lane-scheduled Pallas execution of contraction steps.

The measured bottleneck of the XLA multi-dim dot path is NOT bandwidth: hot
steps contract only K in {8..32} bond values, so the 128x128 MXU runs at
K/128 <= 25% utilization, and XLA adds full-buffer relayout copies plus
separate re/im combine passes (profile: 0.75s copies + 0.59s combines +
0.75s dots of the 2.19s n30 benchmark).

The lane discipline attacks all three at once.  Every tensor is flat with
a known LEG ORDER (always true in this runtime); this module additionally
CHOOSES each step's output leg order so that the *consumer's* contract
legs form a lane run at one END of the buffer.  A step whose big operand
X has its contract legs lane-resident becomes

    one (H, L<=256) x (L, rows) full-MXU real matmul per re/im product:

the small operand W is expanded (by a tiny traced gather) into a
block-diagonal "lane matrix" Wp that contracts the lane-resident bond
values while PRESERVING lane-resident free legs, and re/im are combined
in VMEM inside one Pallas kernel — X is read from HBM exactly once, the
output written exactly once, and no relayout copies are possible (the
kernel pins layouts).  Measured on the dominant n30 step shape: 12.7 ms
(XLA multi-dim dots) -> 2.1 ms (fused lane kernel, 512 GB/s effective).

TWO ORIENTATIONS, because a contraction chain grows contract legs at both
ends of the accumulated buffer:

  head   lanes = LEADING legs; output (H, rows...): fresh legs leading.
  tail   lanes = TRAILING legs; output (rows..., H): fresh legs trailing.

In both, every row leg outside the single protected free run ("f", the
blocked DMA axis) is a GRID leg: the kernel's output index map places it
anywhere in the output order (block-granular permutation for free), which
is how consumer-contract legs are hoisted to an end even from deep inside
X's rows.  Contract legs still in rows are handled by a static combo loop
(<= COMBO_CAP index combinations, each a VMEM slice + accumulated dot).

Steps that do not fit (both operands big, shared batch labels, chunked
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
H_CAP = 1024          # max output lane product (block-diag free x N)
COMBO_CAP = 16        # max row-contract index combinations
WP_ELEMS_CAP = 1 << 19   # max elements of the expanded lane matrix (VMEM)
MIN_X_ELEMS = 1 << 16    # below this, XLA overhead is irrelevant: fall back
SMALL_W_ELEMS = 1 << 13  # "small operand" bound
BLOCK_ELEMS = 1 << 18    # target X-block elements per kernel program
F_MIN = 1 << 10              # min elements of the protected free run; a
                             # consumer-contract leg deeper than this is
                             # hoisted out of the f run (round-2 shipped
                             # 2^30 = hoist disabled, which buried the
                             # consumer's contract legs and broke the
                             # round-3 gather-K kernel chain downstream)

# chip envelope (measured, one v5e core): dense f32 HIGHEST matmul rate and
# the streaming rate the lane kernel itself achieves.  A lane plan is only
# kept when its (padded) MXU work stays within ROOFLINE_SLACK of its HBM
# time — low-L plans waste MXU work on K-padding and the block-diagonal
# and would run SLOWER than the XLA fallback.
MXU_FLOPS_PER_S = 28.6e12
HBM_BYTES_PER_S = 450e9
ROOFLINE_SLACK = 2.5
# orientations the scheduler may use; 'tail' plans measured break-even at
# best on the n30 chain (block-diagonal waste at stranded-leg steps), so
# the default is head-only until the marginal-plan cost model is tighter
ORIENTATIONS = ("head",)


def _prod(xs):
    return reduce(mul, xs, 1)


def kernel_precision(field):
    """The field's dot precision, clamped to what Mosaic supports inside a
    Pallas kernel (DEFAULT / HIGHEST; HIGH = bf16x3 is rejected by the
    Mosaic lowering, so 'high' fields keep full-precision kernel dots —
    the speed win of 'high' mode comes from the XLA fallback steps)."""
    from jax import lax

    precision = getattr(field, "precision", None)
    if precision not in (lax.Precision.DEFAULT, lax.Precision.HIGHEST):
        precision = None
    return precision


def _lane_splits(legs, dim_of):
    """Candidate lane sizes: (count, L) per run with product <= LANE_CAP."""
    out = []
    L = 1
    for k, l in enumerate(legs):
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
                          consumer_contract=(), pinned=()):
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
    pset = set(pinned)
    return tuple(list(pinned)
                 + [l for l in base if l in cset and l not in pset]
                 + [l for l in base if l not in cset and l not in pset])


@dataclass(frozen=True)
class LanePlan:
    """Static metadata for one Pallas-executed step."""

    w_is_j: bool
    orient: str          # 'head' (lanes leading) | 'tail' (lanes trailing)
    view_x: tuple        # X view dims, storage order
    combo_axes: tuple    # indices into view_x of looped row-contract legs
    x_axes: tuple        # per view axis: ('g',leg)|('c',leg)|('L',)|('f',)
    y_axes: tuple        # output axes in iy order: ('g',leg)|('H',)|('f',)
    block: int           # block size along the protected free run
    L: int
    H: int
    n_combos: int
    wp_idx: object       # int32 numpy gather into w_flat:
                         #   head (n_combos, H, L); tail (n_combos, L, H)
    wp_sign: object      # float32 mask, same shape
    view_y: tuple        # output view dims (iy order)
    dims_y: tuple        # logical output dims (iy order)
    flops: int           # real flops (4-dot naive) for cost reporting
    est_s: float         # roofline estimate (ranks candidates)


VMEM_WINDOW_BUDGET = 64 * 1024 * 1024   # scoped VMEM is 128MB; leave
                                        # headroom for register spills
                                        # (58MB observed) + output windows


def _padded_elems(dims):
    """Elements a VMEM window really occupies: minor dim padded to the
    128-lane tile, second-minor to the 8-sublane tile."""
    dims = [int(d) for d in dims if d]
    if not dims:
        return 1
    p = 1
    for d in dims[:-2]:
        p *= d
    if len(dims) >= 2:
        p *= -(-dims[-2] // 8) * 8
    return p * (-(-dims[-1] // 128) * 128)


LAST_REJECT = None


def _rej(msg):
    """Record why the most recent plan_lane_step call rejected (debug)."""
    global LAST_REJECT
    LAST_REJECT = msg
    return None


def plan_lane_step(ix_i, ix_j, iy, dims_i, dims_j, lane_count=None, pin=0,
                   orient="head"):
    """Build a LanePlan for the step, or None if ineligible.

    ``lane_count`` pins the lane run length (legs after the ``pin`` pinned
    prefix for 'head', trailing legs for 'tail'); default tries every
    split x orientation and keeps the best roofline estimate.  ``pin``
    leading X legs (e.g. a sparse amplitude-batch axis) stay leading grid
    legs in the output.
    """
    if lane_count is None:
        best = None
        _b, ix_x0, dims_x0, _w, _dw = _split_big_small(
            ix_i, ix_j, dims_i, dims_j)
        dox = {l: int(d) for l, d in zip(ix_x0, dims_x0)}
        for o in ORIENTATIONS:
            legs = ix_x0[pin:] if o == "head" else tuple(reversed(ix_x0))
            for k, _L in _lane_splits(legs, dox):
                if o == "tail" and k > len(ix_x0) - pin:
                    break
                p = plan_lane_step(ix_i, ix_j, iy, dims_i, dims_j,
                                   lane_count=k, pin=pin, orient=o)
                if p is not None and (best is None or p.est_s < best.est_s):
                    best = p
        return best
    # w_is_j True <=> operand i is the big X side and j is the small W side
    w_is_j, ix_x, dims_x, ix_w, dims_w = _split_big_small(
        ix_i, ix_j, dims_i, dims_j)
    if _prod(dims_x) < MIN_X_ELEMS or _prod(dims_w) > SMALL_W_ELEMS:
        return _rej("size")
    set_x, set_w, set_y = set(ix_x), set(ix_w), set(iy)
    if set_x & set_w & set_y:
        return _rej("shared-batch")
    contract = [l for l in ix_x if l in set_w and l not in set_y]
    n_legs = [l for l in ix_w if l in set_y]
    if set(ix_w) != set(contract) | set(n_legs) or len(set_y) != len(iy):
        return _rej("w-legs")
    dim_of = {}
    for l, d in zip(ix_x, dims_x):
        dim_of[l] = int(d)
    for l, d in zip(ix_w, dims_w):
        dim_of[l] = int(d)

    pinned = list(ix_x[:pin])
    if any(l not in set_y for l in pinned):
        return _rej("pinned-contracted")
    if orient == "head":
        lane_legs = list(ix_x[pin:pin + lane_count])
    else:
        if lane_count > len(ix_x) - pin:
            return _rej("lanes-hit-pin")
        lane_legs = list(ix_x[len(ix_x) - lane_count:])
    L = _prod(dim_of[l] for l in lane_legs)
    if L > LANE_CAP:
        return _rej("L-cap")
    lane_set = set(lane_legs)
    row_legs = [l for l in ix_x if l not in lane_set]
    combo_legs = [l for l in row_legs if l in contract]
    n_combos = _prod(dim_of[l] for l in combo_legs)
    if n_combos > COMBO_CAP:
        return _rej("combos")
    lane_free = [l for l in lane_legs if l not in contract]
    rows_free = [l for l in row_legs if l not in contract]
    H = _prod(dim_of[l] for l in lane_free) * _prod(dim_of[l] for l in n_legs)
    if H > H_CAP or n_combos * L * H > WP_ELEMS_CAP:
        return _rej("H-cap")
    hset = set(lane_free) | set(n_legs)
    h_legs = [l for l in iy if l in hset]
    if len(h_legs) != len(hset):
        return _rej("iy-h")

    # roofline gate: padded MXU time must not dominate the stream time
    rows_total = _prod(dim_of[l] for l in rows_free)
    x_elems = _prod(dims_x)
    compute_s = (4 * 2 * rows_total * max(L, 128) * max(H, 128) * n_combos
                 / MXU_FLOPS_PER_S)
    traffic_s = 4 * (2 * x_elems + 2 * rows_total * H
                     + 2 * n_combos * L * H) / HBM_BYTES_PER_S
    if compute_s > ROOFLINE_SLACK * traffic_s:
        return _rej("roofline")
    est_s = max(compute_s, traffic_s)

    # ---- structural iy checks -------------------------------------------
    combo_set = set(combo_legs)
    rest_rows = [l for l in row_legs if l not in set(pinned)]
    if tuple(iy[:pin]) != tuple(pinned):
        return _rej("iy-pin")
    if orient == "head":
        # f run = longest iy SUFFIX kept in X's row order; combo legs at
        # X's very end sit BEYOND the f run (they are full in the block,
        # so DMA contiguity passes straight through them)
        skip = 0
        while (skip < len(rest_rows)
               and rest_rows[-(skip + 1)] in combo_set):
            skip += 1
        rr = rest_rows[:len(rest_rows) - skip]
        n_f = 0
        while (n_f < len(rr) and n_f < len(iy)
               and iy[-(n_f + 1)] == rr[-(n_f + 1)]
               and rr[-(n_f + 1)] not in combo_set):
            n_f += 1
        f_legs = rr[len(rr) - n_f:] if n_f else []
        head = list(iy[:len(iy) - n_f])
    else:
        # f run = longest iy run (right after the pin) kept in X row
        # order; combo legs at X's very front sit before it
        skip = 0
        while skip < len(rest_rows) and rest_rows[skip] in combo_set:
            skip += 1
        rr = rest_rows[skip:]
        n_f = 0
        while (n_f < len(rr) and pin + n_f < len(iy)
               and iy[pin + n_f] == rr[n_f]
               and rr[n_f] not in combo_set):
            n_f += 1
        f_legs = rr[:n_f]
        head = list(iy[:pin]) + list(iy[pin + n_f:])
    if not f_legs:
        return _rej("no-f-run")
    F = _prod(dim_of[l] for l in f_legs)
    grid_legs = pinned + [l for l in rest_rows
                          if l not in combo_set and l not in set(f_legs)]
    h_pos = [k for k, l in enumerate(head) if l in hset]
    if h_pos and h_pos[-1] - h_pos[0] + 1 != len(h_pos):
        return _rej("h-contig")
    if set(head) - hset != set(grid_legs):
        return _rej("head-set")
    inner_budget = max(1, BLOCK_ELEMS // max(n_combos * L, 1))
    block = max(1, min(F, inner_budget))
    while F % block:
        block -= 1
    if block < 128 and (grid_legs or combo_legs):
        return _rej("block-small")
    # Mosaic block rules: PARTIAL dims in the last two block positions
    # need %8 (second-minor) / %128 (minor); FULL dims are exempt;
    # SQUEEZED ('g') axes must not occupy the last two positions.  The
    # blocked f axis is minor for 'head' (needs %128 unless full) and
    # leading for 'tail' (needs %8 when second-minor).
    if orient == "head":
        if block != F and block % 128:
            return _rej("tile-div")
    else:
        if block != F and block % 8:
            return _rej("tile-div")

    # ---- wp gather construction (host, numpy) ---------------------------
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

    # head: wp (n_combos, H, L) used as wp @ v; tail: (n_combos, L, H)
    if orient == "head":
        ldim, hdim = 2, 1
        shape = (n_combos, H, L)
    else:
        ldim, hdim = 1, 2
        shape = (n_combos, L, H)
    idx = np.zeros(shape, dtype=np.int64)
    mask = np.ones(shape, dtype=np.float32)

    def _bc(arr, axis):
        sh = [1, 1, 1]
        sh[axis] = arr.shape[0]
        return arr.reshape(sh)

    for l in lane_c:
        idx += _bc(lane_vals[l], ldim) * w_strides[l]
    for l in combo_legs:
        idx += _bc(combo_vals[l], 0) * w_strides[l]
    for l in n_legs:
        idx += _bc(h_vals[l], hdim) * w_strides[l]
    for l in lane_free:
        mask = mask * (_bc(lane_vals[l], ldim)
                       == _bc(h_vals[l], hdim)).astype(np.float32)

    # ---- views -----------------------------------------------------------
    # x view in storage order; exactly one 'f' (blocked) axis; kernel
    # values stay 2-D after combo indexing and 'g' squeezing.
    x_axes = []
    for l in ix_x:
        if l in lane_set:
            if not x_axes or x_axes[-1][0] != "L":
                x_axes.append(("L", None))
        elif l in set(f_legs):
            if not x_axes or x_axes[-1][0] != "f":
                x_axes.append(("f", None))
        elif l in combo_set:
            x_axes.append(("c", l))
        else:
            x_axes.append(("g", l))
    y_axes = []
    placed_h = False
    k = 0
    iy_list = list(iy)
    while k < len(iy_list):
        l = iy_list[k]
        if l in hset:
            if not placed_h:
                y_axes.append(("H", None))
                placed_h = True
            k += 1
        elif l in set(f_legs):
            y_axes.append(("f", None))
            k += len(f_legs)
        else:
            y_axes.append(("g", l))
            k += 1
    if not placed_h:
        y_axes.append(("H", None))

    # squeezed ('g') axes must not sit in the last two block positions
    if [k for k, _l in x_axes[-2:]].count("g"):
        return _rej("g-in-tile")
    if [k for k, _l in y_axes[-2:]].count("g"):
        return _rej("g-in-tile-y")

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
    # Mosaic-padded VMEM demand of the block windows: VMEM tiles are
    # (8, 128) in (second-minor, minor), so a small trailing dim (e.g. a
    # dim-2 combo axis stored minor) inflates the window 64x — measured
    # as a 318MB-scoped-VMEM compile abort on the sc25 plan sweep
    # (docs/BENCH_NOTES.md round-3).  Windows are double-buffered and
    # re/im are separate operands.
    xwin = [view_dims[k] if kind in ("c", "L") else block
            for k, (kind, l) in enumerate(x_axes) if kind != "g"]
    ywin = [H if kind == "H" else block
            for kind, l in y_axes if kind != "g"]
    wwin = list(idx.shape)
    vmem = 4 * 2 * 2 * (_padded_elems(xwin) + _padded_elems(ywin)
                        + _padded_elems(wwin))
    if vmem > VMEM_WINDOW_BUDGET:
        return _rej("vmem")
    flops = 4 * 2 * rows_total * L * H * n_combos
    return LanePlan(w_is_j, orient, view_dims, combo_axes, tuple(x_axes),
                    tuple(y_axes), block, L, H, n_combos,
                    idx.astype(np.int32), mask, view_y, dims_y, flops, est_s)


def schedule_step(ix_i, ix_j, iy_set, dims_i, dims_j, consumer_contract=(),
                  pin=0):
    """Choose the step's output order and (when feasible) its LanePlan.

    Tries every lane split in BOTH orientations; candidate output orders
    hoist the consumer's contract legs to the output end matching the
    orientation (leading for 'head', trailing for 'tail'), with only the
    protected free run immobile.  When no candidate is feasible the step
    runs on the XLA path with full order freedom (fallback_output_order).

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
        for o in ORIENTATIONS:
            legs = ix_x[pin:] if o == "head" else tuple(reversed(ix_x))
            for k, _L in _lane_splits(legs, dim_of):
                if o == "tail" and k > len(ix_x) - pin:
                    break
                if o == "head":
                    lane_legs = list(ix_x[pin:pin + k])
                else:
                    lane_legs = list(ix_x[len(ix_x) - k:])
                lane_set = set(lane_legs)
                row_legs = [l for l in ix_x[pin:] if l not in lane_set]
                rows_free = [l for l in row_legs if l in iy_set
                             and l not in set_w]
                lane_free = [l for l in lane_legs
                             if l in iy_set and l not in set_w]
                # protected f run: minimal free run of >= F_MIN elements at
                # the end OPPOSITE the lanes; everything else is hoistable
                seq = (list(reversed(row_legs)) if o == "head"
                       else list(row_legs))
                skip = 0
                while skip < len(seq) and seq[skip] in contract_set:
                    skip += 1
                n_f = 0
                fprod = 1
                for l in seq[skip:]:
                    if l in contract_set:
                        break
                    if fprod >= F_MIN and l in cset:
                        break
                    n_f += 1
                    fprod *= dim_of[l]
                if o == "head":
                    f_legs = row_legs[len(row_legs) - skip - n_f:
                                      len(row_legs) - skip]
                else:
                    f_legs = row_legs[skip:skip + n_f]
                gables = [l for l in rows_free if l not in set(f_legs)]
                if o == "head":
                    h = [l for l in lane_free + new if l in cset]
                    h += [l for l in lane_free + new if l not in cset]
                    head = [l for l in gables if l in cset] + h
                    rest = [l for l in gables if l not in cset]
                    iy_k = tuple(pinned + head + rest + f_legs)
                else:
                    h = [l for l in lane_free + new if l not in cset]
                    h += [l for l in lane_free + new if l in cset]
                    rest = [l for l in gables if l not in cset]
                    tail_g = [l for l in gables if l in cset]
                    iy_k = tuple(pinned + f_legs + rest + tail_g + h)
                p = plan_lane_step(ix_i, ix_j, iy_k, dims_i, dims_j,
                                   lane_count=k, pin=pin, orient=o)
                if p is not None and (best is None
                                      or p.est_s < best[1].est_s):
                    best = (iy_k, p)
    # gather-K candidate: no layout demands on the producer, scattered
    # contract legs welcome — prefer it unless the v1 lane plan is clearly
    # faster (v1 reaches full-MXU width when the layout cooperates, but
    # its layout must be DELIVERED by the producer, which costs a reorder
    # the est_s numbers don't see)
    from .gatherk import gk_output_order, plan_gk_step

    iy_gk = gk_output_order(ix_i, ix_j, iy_set, dims_i, dims_j, pin=pin,
                            consumer_contract=consumer_contract)
    gkp = plan_gk_step(ix_i, ix_j, iy_gk, dims_i, dims_j, pin=pin)
    if gkp is not None and (best is None
                            or gkp.est_s <= best[1].est_s * 1.25):
        return iy_gk, gkp
    if best is not None:
        return best
    if (_prod(dims_i) > SMALL_W_ELEMS and _prod(dims_j) > SMALL_W_ELEMS
            and not (set_x & set_w & iy_set) and pin == 0):
        # both operands big: try the fused pair kernel with the natural
        # (i-free legs, j-free legs) output order
        rows_i = [l for l in ix_i if l in iy_set]
        rows_j = [l for l in ix_j if l in iy_set and l not in set(rows_i)]
        iy_p = tuple(rows_i + rows_j)
        p = plan_pair_step(ix_i, ix_j, iy_p, dims_i, dims_j)
        if p is not None:
            return iy_p, p
    return fallback_output_order(ix_i, ix_j, iy_set, dims_i, dims_j,
                                 consumer_contract,
                                 pinned=tuple(ix_x[:pin])), None


# -- execution -------------------------------------------------------------

def _build_wp(w_flat, plan):
    """Lane matrix from the flat W payload (traced, tiny)."""
    import jax.numpy as jnp

    idx = jnp.asarray(plan.wp_idx)
    sign = jnp.asarray(plan.wp_sign)
    return jnp.take(w_flat.reshape((-1,)), idx) * sign


def _kernel(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref, *, plan,
            precision=None):
    import jax.numpy as jnp
    from jax import lax

    dot = partial(lax.dot_general,
                  dimension_numbers=(((1,), (0,)), ((), ())),
                  precision=precision or lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    re = im = None
    for c in range(plan.n_combos):
        digits = {}
        rem = c
        for k in reversed(plan.combo_axes):
            d = plan.view_x[k]
            digits[k] = rem % d
            rem //= d
        idx = []
        for k, (kind, l) in enumerate(plan.x_axes):
            if kind in ("L", "f"):
                idx.append(slice(None))
            elif kind == "c":
                idx.append(digits[k])
            # 'g' axes are squeezed out of the block: no index entry
        vr = xr_ref[tuple(idx)]   # head: (L, blk); tail: (blk, L)
        vi = xi_ref[tuple(idx)]
        wr = wr_ref[c]            # head: (H, L); tail: (L, H)
        wi = wi_ref[c]
        if plan.orient == "head":
            a, b = dot(wr, vr), dot(wi, vi)
            cc, d2 = dot(wi, vr), dot(wr, vi)
        else:
            a, b = dot(vr, wr), dot(vi, wi)
            cc, d2 = dot(vr, wi), dot(vi, wr)
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

    f_axis_x = next(k for k, (kind, l) in enumerate(plan.x_axes)
                    if kind == "f")
    F = plan.view_x[f_axis_x]
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

    wspec = pl.BlockSpec(plan.wp_idx.shape,
                         lambda *g: (0, 0, 0), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec(tuple(xblock), x_index, memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec(tuple(yblock), y_index, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(plan.view_y, jnp.float32)
    traffic = 4 * (2 * _prod(plan.view_x) + 2 * _prod(plan.view_y)
                   + 2 * plan.wp_idx.size)
    precision = kernel_precision(field)
    yr, yi = pl.pallas_call(
        partial(_kernel, plan=plan, precision=precision),
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


# -- both-big pair kernel ---------------------------------------------------

LANE_STEPS_CAP = 160   # max Pallas calls per scheme: every kernel adds
                       # remote-compile cost, and pod-scale schemes (450+
                       # steps) measured pathological compile times with
                       # unbounded kernel counts.  Raised from 48 in round
                       # 3: gather-K kernels cover most steps of the
                       # headline scheme and their compile cost is small
                       # (compile measured end-to-end in bench.py)
PAIR_K_CAP = 2048      # contract size per kernel (VMEM: 2 ops x 2 comps)
PAIR_TILE = 256


@dataclass(frozen=True)
class PairPlan:
    """Fused complex matmul for steps where BOTH operands are big.

    Requires the contract legs to form the LEADING run of both operands
    (the lane scheduler's producers hoist the consumer's contract legs to
    the front, so chains of big merges arrive in this form).  The two
    operands' contract-leg ORDERS may differ: the smaller side's K rows
    are aligned by one XLA row-gather (contiguous rows, ~|V| extra
    traffic), then the kernel runs plain (K,bm)x(K,bn) -> (bm,bn)
    TT-form tiles with all four re/im products fused and combined in
    VMEM.  Both operands are read once per tile pass; K >= 128 steps run
    the MXU at full contraction width.
    """

    K: int
    M: int
    N: int
    bm: int
    bn: int
    v_perm: object       # int32 K-permutation for the j operand (or None)
    swap: bool           # operands arrived as (V, X): swap before use
    dims_y: tuple
    flops: int
    est_s: float
    re_i: object = None  # input Reorder to (contract, rows) form (or None)
    re_j: object = None


def plan_pair_step(ix_i, ix_j, iy, dims_i, dims_j):
    """Build a PairPlan, or None if the step does not fit."""
    set_i, set_j, set_y = set(ix_i), set(ix_j), set(iy)
    if set_i & set_j & set_y:
        return _rej("pair-shared")
    if _prod(dims_i) <= SMALL_W_ELEMS or _prod(dims_j) <= SMALL_W_ELEMS:
        return _rej("pair-small")
    dim_of = {}
    for l, d in zip(ix_i, dims_i):
        dim_of[l] = int(d)
    for l, d in zip(ix_j, dims_j):
        dim_of[l] = int(d)
    contract = [l for l in ix_i if l in set_j and l not in set_y]
    nc = len(contract)
    if not nc:
        return _rej("pair-outer")
    rows_i = [l for l in ix_i if l not in set(contract)]
    rows_j = [l for l in ix_j if l not in set(contract)]
    if set(rows_i) & set_j or set(rows_j) & set_i:
        return _rej("pair-extra-shared")
    # iy must group i-rows then j-rows, but WITHIN each group any order
    # works: the input pre-permute absorbs it
    if tuple(iy) != tuple([l for l in iy if l in set(rows_i)]
                          + [l for l in iy if l in set(rows_j)]):
        return _rej("pair-iy")
    rows_i = [l for l in iy if l in set(rows_i)]
    rows_j = [l for l in iy if l in set(rows_j)]
    # scattered contract legs: pre-permute each operand to
    # (contract-canonical, rows-in-iy-order) with a cheap run-collapsed
    # transpose (operands here are ~2^17-2^19 elements; TRANSPOSE_MAX
    # bounds it)
    from .lowering import plan_reorder

    def _pre(ix, rows):
        want = tuple(contract) + tuple(rows)
        if tuple(ix) == want:
            return None
        pos = {l: k for k, l in enumerate(ix)}
        r = plan_reorder(tuple(dim_of[l] for l in ix),
                         tuple(pos[l] for l in want),
                         (_prod(dim_of[l] for l in contract),
                          _prod(dim_of[l] for l in rows)))
        return r if r.mode == "transpose" else None

    re_i = _pre(ix_i, rows_i)
    re_j = _pre(ix_j, rows_j)
    if (tuple(ix_i) != tuple(contract) + tuple(rows_i) and re_i is None)             or (tuple(ix_j) != tuple(contract) + tuple(rows_j)
                and re_j is None):
        return _rej("pair-K-not-leading")
    K = _prod(dim_of[l] for l in contract)
    M = _prod(dim_of[l] for l in rows_i)
    N = _prod(dim_of[l] for l in rows_j)
    bm = min(PAIR_TILE, M)
    bn = min(PAIR_TILE, N)
    if K > PAIR_K_CAP or K % 8 or bm % 128 or bn % 128             or M % bm or N % bn:
        return _rej("pair-tile")
    # roofline: tiles re-read X N/bn times and V M/bm times; input
    # pre-permutes cost one extra read+write pass each
    reads = 4 * 2 * (M * K * (N // bn) + K * N * (M // bm) + M * N)
    reads += 4 * 2 * 2 * ((M * K if re_i is not None else 0)
                          + (K * N if re_j is not None else 0))
    compute_s = (4 * 2 * M * N * K
                 / (MXU_FLOPS_PER_S * min(1.0, K / 128.0)))
    traffic_s = reads / HBM_BYTES_PER_S
    if compute_s > ROOFLINE_SLACK * max(
            traffic_s, 4 * 2 * (M * K + K * N + M * N) / HBM_BYTES_PER_S):
        return _rej("pair-roofline")
    # K-order alignment: j's leading legs permuted to i's order (only
    # relevant when j was NOT pre-permuted — the pre-permute already
    # delivers the canonical contract order)
    if re_j is not None or tuple(ix_j[:nc]) == tuple(contract):
        v_perm = None
    elif False:
        pass
    else:
        strides = {}
        s = 1
        for l in reversed(ix_j[:nc]):
            strides[l] = s
            s *= dim_of[l]
        ks = np.arange(K, dtype=np.int64)
        digits = {}
        rem = ks
        for l in reversed(ix_i[:nc]):
            d = dim_of[l]
            digits[l] = rem % d
            rem = rem // d
        v_perm = np.zeros(K, dtype=np.int64)
        for l in ix_i[:nc]:
            v_perm += digits[l] * strides[l]
        v_perm = v_perm.astype(np.int32)
    dims_y = tuple(dim_of[l] for l in iy)
    flops = 4 * 2 * M * N * K
    return PairPlan(K, M, N, bm, bn, v_perm, False, dims_y, flops,
                    max(compute_s, traffic_s), re_i, re_j)


def _pair_kernel(xr_ref, xi_ref, vr_ref, vi_ref, or_ref, oi_ref,
                 precision=None):
    import jax.numpy as jnp
    from jax import lax

    dot = partial(lax.dot_general,
                  dimension_numbers=(((0,), (0,)), ((), ())),
                  precision=precision or lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    xr, xi = xr_ref[...], xi_ref[...]
    vr, vi = vr_ref[...], vi_ref[...]
    or_ref[...] = dot(xr, vr) - dot(xi, vi)
    oi_ref[...] = dot(xr, vi) + dot(xi, vr)


def _pair_kernel_b(xr_ref, xi_ref, vr_ref, vi_ref, or_ref, oi_ref,
                   precision=None):
    """Batched pair kernel: blocks carry a leading size-1 batch axis."""
    import jax.numpy as jnp
    from jax import lax

    dot = partial(lax.dot_general,
                  dimension_numbers=(((0,), (0,)), ((), ())),
                  precision=precision or lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    xr, xi = xr_ref[0], xi_ref[0]
    vr, vi = vr_ref[0], vi_ref[0]
    or_ref[0] = dot(xr, vr) - dot(xi, vi)
    oi_ref[0] = dot(xr, vi) + dot(xi, vr)


def apply_pair_step(field, x, y, plan, interpret=None):
    """Execute a both-big pair step on SplitField pairs (traceable).

    Under jax.vmap (the executor's slice batching) a custom batching rule
    makes the batch a leading GRID axis with per-instance block windows —
    naive pallas batching folds the whole batch into the VMEM window
    (the compile-abort class of docs/BENCH_NOTES.md round 3)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .lowering import physical_shape

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    K, M, N = plan.K, plan.M, plan.N
    from .lowering import apply_reorder
    if plan.re_i is not None:
        x = apply_reorder(field, x, plan.re_i)
    if plan.re_j is not None:
        y = apply_reorder(field, y, plan.re_j)
    xs = field.reshape(x, (K, M))
    vs = field.reshape(y, (K, N))
    if plan.v_perm is not None:
        vs = field.take(vs, jnp.asarray(plan.v_perm), axis=0)
    precision = kernel_precision(field)
    params = dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=plan.flops,
            bytes_accessed=8 * (M * K + K * N + M * N),
            transcendentals=0),
        interpret=interpret)

    @jax.custom_batching.custom_vmap
    def pair(xr, xi, vr, vi):
        xspec = pl.BlockSpec((K, plan.bm), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM)
        vspec = pl.BlockSpec((K, plan.bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((plan.bm, plan.bn), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((M, N), jnp.float32)
        return pl.pallas_call(
            partial(_pair_kernel, precision=precision),
            grid=(M // plan.bm, N // plan.bn),
            in_specs=[xspec, xspec, vspec, vspec],
            out_specs=(ospec, ospec),
            out_shape=(out_shape, out_shape),
            **params,
        )(xr, xi, vr, vi)

    @pair.def_vmap
    def pair_vmap(axis_size, in_batched, xr, xi, vr, vi):
        W = axis_size
        args = [a if b else jnp.broadcast_to(a[None], (W,) + a.shape)
                for a, b in zip((xr, xi, vr, vi), in_batched)]
        xspec = pl.BlockSpec((1, K, plan.bm), lambda w, i, j: (w, 0, i),
                             memory_space=pltpu.VMEM)
        vspec = pl.BlockSpec((1, K, plan.bn), lambda w, i, j: (w, 0, j),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, plan.bm, plan.bn),
                             lambda w, i, j: (w, i, j),
                             memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((W, M, N), jnp.float32)
        out = pl.pallas_call(
            partial(_pair_kernel_b, precision=precision),
            grid=(W, M // plan.bm, N // plan.bn),
            in_specs=[xspec, xspec, vspec, vspec],
            out_specs=(ospec, ospec),
            out_shape=(out_shape, out_shape),
            **params,
        )(*args)
        return out, (True, True)

    yr, yi = pair(xs[0], xs[1], vs[0], vs[1])
    return field.reshape((yr, yi), physical_shape(plan.dims_y))


def prune_lane_plans(steps, cap=None):
    """Keep only the ``cap`` most valuable lane plans of a compiled scheme
    (by estimated kernel time — a proxy for the traffic the kernel saves);
    the rest revert to the XLA lowering.  Orders are left as scheduled.
    Returns the number of plans kept.
    """
    import dataclasses

    cap = LANE_STEPS_CAP if cap is None else cap
    laned = [(k, s) for k, s in enumerate(steps) if s.lane is not None]
    if len(laned) <= cap:
        return len(laned)
    laned.sort(key=lambda t: -t[1].lane.est_s)
    for k, s in laned[cap:]:
        steps[k] = dataclasses.replace(s, lane=None)
    return cap
