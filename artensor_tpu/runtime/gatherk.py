"""Gather-K step kernel: big-X x small-W contractions with SCATTERED
contract legs, executed at the HBM roofline.

The headline scheme's dominant step form (scripts/step_census.py) is

    Y[free..., new...] = sum_K  X[free..., K scattered ...] . W[K, new]

with X ~ 2^21-2^22 elements, K = prod(contract dims) in 8..64 and
H = prod(new dims) in 4..64.  The round-2 lane kernel rejects these (its
contiguous-lane discipline turns scattered contract legs into combo loops
whose padded MXU passes fail the roofline gate), so they fall to the XLA
multi-dim dot path, which adds relayout copies, separate re/im combine
passes and an explicit output reorder — measured ~2x the modeled roofline
for the whole scheme (1.93s vs 0.91s, docs/BENCH_NOTES.md).

The trick here: every free X leg that is not part of the trailing free run
becomes a SQUEEZED grid dimension of the Pallas block, so the scattered
contract legs are automatically ADJACENT in the kernel's VMEM block — no
data movement, the DMA engine just walks the strides.  The block is

    X block  (c_1, ..., c_n, bf, 128)     c axes full, f run tiled
    Y block  (H, bf, 128)                 placed anywhere via the grid map

and the contraction runs as H*K unrolled VPU broadcast-FMAs (padding-free;
the MXU is useless below K*H ~ 10^3 because a (H,K)x(K,blk) dot pads both
H and K to 128) or, when the contract legs are contiguous and K is large,
as per-128-column MXU dots.  All four re/im products fuse in VMEM: X is
read from HBM exactly once, Y written exactly once, and the output leg
ORDER is free (grid legs map anywhere), so the step needs no reorder pass
and imposes NO layout demands on its producer.

W is exactly K*H elements (every W leg is either contracted or fresh), so
it is gathered into an (H, K) matrix by one tiny trace-time take.

No reference analogue: /root/reference executes one torch.einsum per step
(artensor/contraction.py:62-76).
"""

from dataclasses import dataclass
from functools import partial, reduce
from operator import mul

import numpy as np

MIN_X_ELEMS = 1 << 16    # below this XLA overhead is irrelevant
HK_CAP = 1 << 14         # max W elements (= H*K; w4 = 4*HK_CAP f32 in VMEM)
GK_VMEM_BUDGET = 96 * 1024 * 1024   # scoped VMEM cap for the padded,
                                    # double-buffered block windows (the
                                    # pallas vmem_limit is 100MB; chip
                                    # scoped VMEM is 128MB)
H_CAP = 2048             # max fresh-leg product (out block sublanes)
UNROLL_CAP = 512         # max H*K for the unrolled VPU loop
GRID_CAP = 1 << 15       # max grid programs
VIEW_RANK_CAP = 10       # mosaic-safe view rank (rank-10 blocks with 7
                         # leading full/squeezed axes compile and run on
                         # the chip — scripts/gk_probe.py round-3 probe)
BLOCK_F = 1 << 15        # target f elements per block (VMEM budget binds)
PROGRAM_OVERHEAD_S = 0.9e-6   # measured per-grid-program cost (the
                              # 0.457s vmap'd kernel at 2^19 programs);
                              # under a slice-vmap the grid multiplies by
                              # the batch width, so small-block plans are
                              # overhead-bound and must price it in
# measured-rate envelope (see scripts/gk_probe2.py, tuned on the v5e chip:
# the broadcast-FMA loop sustains ~0.9-1.0 TFLOP/s-true)
VPU_FLOPS_PER_S = 1.0e12
MXU_FLOPS_PER_S = 28.6e12
MXU_CLOCK_HZ = 0.94e9    # v5e core clock: one 128x128 MXU pass per cycle
HBM_BYTES_PER_S = 450e9
SLACK = 2.0              # accept when est_gk < est_xla * SLACK — the XLA
                         # estimate is an OPTIMISTIC bound (it ignores the
                         # reorder pass, relayout copies and separate re/im
                         # combines; round-2 measured the whole scheme at
                         # ~2x its modeled floor on the XLA path)

LAST_REJECT = None


def _prod(xs):
    return reduce(mul, xs, 1)


def _rej(msg):
    global LAST_REJECT
    LAST_REJECT = msg
    return None


@dataclass(frozen=True)
class GKPlan:
    """Static metadata for one gather-K step."""

    w_is_j: bool
    view_x: tuple        # X view dims (storage order; f split as F/128,128)
    x_axes: tuple        # per view axis: ('g', gid) | ('c', None) | ('f', k)
    view_y: tuple
    y_axes: tuple        # per view axis: ('g', gid) | ('H',) | ('f', k)
    block: int           # f elements per block (multiple of 128)
    K: int
    H: int
    c_dims: tuple        # dims of the c view axes (prod = K)
    wk_idx: object       # (H, K) int32 gather into w_flat
    use_mxu: bool
    dims_y: tuple        # logical output dims (iy order)
    flops: int           # true real flops (4-product counting)
    est_s: float
    qb: int = 1          # slice instances packed per MXU dot under vmap
    fm: int = 128        # minor lane width of the f split (128, 64 or 32)
    gb_gid: object = None  # grid run blocked by gt (short-F amortization)
    gt: int = 1
    pre: object = None   # Reorder applied to X before the kernel (the
                         # pre-reordered GK form for no-f-run steps)
    px: object = None    # X leg order the pre reorder produces (labels);
                         # the scheme compiler uses it to ask X's PRODUCER
                         # to emit this order directly (pass 2), making
                         # the explicit pre transpose unnecessary
    w_dims: object = None  # W's stored digit dims (prod = H*K).  wk_idx
                         # is built purely from digit strides, so the wk
                         # take is ALWAYS a digit transpose of the stored
                         # row — with w_perm it lowers as reshape ->
                         # transpose -> reshape (XLA transpose copy)
                         # instead of a gather
    w_perm: object = None  # stored-digit positions in target (H-digits,
                         # K-digits) order


def gk_window_bytes(x_axes, view_x, y_axes, K, H, fm, gb_gid,
                    qb, gt, block):
    """Scoped-VMEM bytes the kernel's block windows really occupy:
    Mosaic-padded to the (8,128) tile, double-buffered, re/im separate
    operands, including the qb slice instances packed per program and
    the gt sub-problems one program covers."""
    from .lanes import _padded_elems

    bf = block // fm
    xw = [qb]
    for k2, (kind, gid) in enumerate(x_axes):
        if kind == "c":
            xw.append(view_x[k2])
        elif kind == "g":
            if gid == gb_gid:
                xw.append(gt)
        elif gid == 0:          # ('f', 0)
            xw.append(bf)
        else:                   # ('f', 1)
            xw.append(fm)
    yw = [qb]
    for a in y_axes:
        if a[0] == "g":
            if a[1] == gb_gid:
                yw.append(gt)
        elif a[0] == "H":
            yw.append(H)
        elif a == ("f", 0):
            yw.append(bf)
        else:
            yw.append(fm)
    pad128 = lambda n: -(-n // 128) * 128
    w_el = pad128(qb * 2 * H) * pad128(qb * 2 * K)
    return (4 * 2 * 2 * (_padded_elems(xw) + _padded_elems(yw))
            + 4 * 2 * w_el)


def plan_window_bytes(plan):
    """gk_window_bytes for a finished GKPlan (regression-audit hook)."""
    return gk_window_bytes(plan.x_axes, plan.view_x, plan.y_axes,
                           plan.K, plan.H, plan.fm, plan.gb_gid,
                           plan.qb, plan.gt, plan.block)


def xla_step_estimate(ix_i, ix_j, iy, dims_i, dims_j):
    """Modeled wall time of the XLA fallback for one step: K-discounted MXU
    vs HBM traffic, INCLUDING the output-reorder pass the fallback pays
    whenever iy deviates from the dot's natural (batch, lhs-free,
    rhs-free) order — which under time-ordered layouts is nearly always."""
    set_i, set_j, set_y = set(ix_i), set(ix_j), set(iy)
    dim_of = dict(zip(ix_i, dims_i))
    dim_of.update(zip(ix_j, dims_j))
    K = _prod(int(dim_of[l]) for l in set_i & set_j if l not in set_y)
    y_elems = _prod(int(dim_of[l]) for l in iy)
    x_elems, w_elems = _prod(dims_i), _prod(dims_j)
    flops = 4 * 2 * y_elems * K
    traffic = 4 * 2 * (x_elems + w_elems + y_elems)
    from .lowering import preferred_output_order
    if tuple(iy) != preferred_output_order(ix_i, ix_j, set_y,
                                           dims_i, dims_j):
        traffic += 4 * 2 * 2 * y_elems      # read + write reorder pass
    rate = MXU_FLOPS_PER_S * min(1.0, K / 128.0)
    return max(flops / rate, traffic / HBM_BYTES_PER_S)


def plan_gk_step(ix_i, ix_j, iy, dims_i, dims_j, pin=0, row_mode=False):
    """Build a GKPlan for the step with the GIVEN output order, or None.

    ``row_mode``: planning the PER-ROW problem of a gathered (aligned)
    step — size/overhead gates are skipped (the caller gates at the
    whole-batch level, where the per-program cost amortizes over rows).
    """
    iy = tuple(iy)
    if len(set(iy)) != len(iy):
        return _rej("iy-dup")
    big_is_i = _prod(dims_i) >= _prod(dims_j)
    if big_is_i:
        w_is_j, ix_x, dims_x, ix_w, dims_w = True, ix_i, dims_i, ix_j, dims_j
    else:
        w_is_j, ix_x, dims_x, ix_w, dims_w = False, ix_j, dims_j, ix_i, dims_i
    x_elems, w_elems = _prod(dims_x), _prod(dims_w)
    if x_elems < MIN_X_ELEMS and not row_mode:
        return _rej("x-small")
    if w_elems > HK_CAP:
        return _rej("w-big")
    set_x, set_w, set_y = set(ix_x), set(ix_w), set(iy)
    if set_x & set_w & set_y:
        return _rej("shared-batch")
    dim_of = {l: int(d) for l, d in zip(ix_x, dims_x)}
    for l, d in zip(ix_w, dims_w):
        dim_of[l] = int(d)
    contract = [l for l in ix_x if l in set_w and l not in set_y]
    n_legs_set = {l for l in ix_w if l in set_y}
    if set_w != set(contract) | n_legs_set or len(n_legs_set) + len(
            contract) != len(ix_w):
        return _rej("w-legs")
    if set_y != (set_x - set(contract)) | n_legs_set:
        return _rej("y-legs")
    if tuple(iy[:pin]) != tuple(ix_x[:pin]):
        return _rej("iy-pin")
    if any(l not in set_y for l in ix_x[:pin]):
        return _rej("pin-contracted")
    K = _prod(dim_of[l] for l in contract)
    H = _prod(dim_of[l] for l in n_legs_set)
    if H > H_CAP:
        return _rej("H-cap")
    cset = set(contract)

    # trailing free run of X = the blocked f axis
    n_f = 0
    F = 1
    for l in reversed(ix_x[pin:]):
        if l in cset:
            break
        n_f += 1
        F *= dim_of[l]
    f_legs = list(ix_x[len(ix_x) - n_f:]) if n_f else []

    def _contig_in_iy(run):
        if run[0] not in set_y:
            return False
        k = iy.index(run[0])
        return tuple(iy[k:k + len(run)]) == tuple(run)

    # shrink until the run (a) splits as (F/fm, fm) for a lane width
    # fm in {128, 64, 32} and (b) appears as a contiguous same-order run
    # in iy (dropped legs become grid legs).  fm < 128 wastes VMEM lanes
    # and compute proportionally (priced into the est below) but rescues
    # steps whose minor free run is short — the dominant residual class.
    def _fm_of(F):
        # sub-128 minor views of a LARGE buffer force XLA to materialize a
        # lane-padded copy (measured: a GB-scale T(1,128) duplicate that
        # OOMed the w128 bench program), so fm < 128 is small-X only
        for fm in (128, 64, 32):
            if F % fm == 0 and (fm == 128 or x_elems <= (1 << 20)):
                return fm
        return 0

    while f_legs and (not _fm_of(F) or not _contig_in_iy(f_legs)):
        F //= dim_of[f_legs[0]]
        f_legs = f_legs[1:]
    fm = _fm_of(F) if f_legs else 0
    if not fm:
        return _rej("no-f-run")
    f_set = set(f_legs)
    # block bounded by the VMEM budget for (x re/im + y re/im) blocks
    vmem_budget = (12 << 20) // (4 * 2 * (K + H))
    block = min(F, BLOCK_F, max(8 * fm, vmem_budget // fm * fm))
    while F % block:
        block -= fm
    if block < fm:
        return _rej("block-small")

    # ---- X view: merge adjacent same-class runs --------------------------
    # g runs may only merge when they appear adjacently in iy in the same
    # order (each merged run is ONE grid dim mapping to ONE y axis)
    iy_pos = {l: k for k, l in enumerate(iy)}
    raw = []
    for l in ix_x:
        if l in f_set:
            cls = "f"
        elif l in cset:
            cls = "c"
        else:
            cls = "g"
        if raw and raw[-1][0] == cls == "c":
            raw[-1][1].append(l)
        elif (raw and raw[-1][0] == cls == "g"
                and iy_pos[l] == iy_pos[raw[-1][1][-1]] + 1):
            raw[-1][1].append(l)
        elif raw and raw[-1][0] == cls == "f":
            raw[-1][1].append(l)
        else:
            raw.append([cls, [l]])
    x_axes = []
    view_x = []
    c_dims = []
    g_runs = []          # leg tuples, one per grid dim (in view order)
    for cls, legs in raw:
        d = _prod(dim_of[l] for l in legs)
        if cls == "c":
            x_axes.append(("c", None))
            view_x.append(d)
            c_dims.append(d)
        elif cls == "g":
            x_axes.append(("g", len(g_runs)))
            view_x.append(d)
            g_runs.append(tuple(legs))
        else:
            x_axes.append(("f", 0))
            view_x.append(F // fm)
            x_axes.append(("f", 1))
            view_x.append(fm)
    if len(view_x) > VIEW_RANK_CAP:
        return _rej("rank")
    if any(kind == "g" for kind, _ in x_axes[-2:]):
        return _rej("g-in-tile")
    n_grid = _prod(_prod(dim_of[l] for l in r) for r in g_runs)

    # short-F steps: per-program work K*F is tiny, so the grid (and with
    # it the ~0.9us/program cost, multiplied by the slice-vmap width)
    # explodes.  Block the largest grid axis by gt so each program covers
    # gt instances of the (K, F) problem.
    gb_gid = None
    gt = 1
    if not row_mode and block == F \
            and K * F * max(1, H // max(K, 1)) < BLOCK_F:
        cands = [(view_x[k], a[1]) for k, a in enumerate(x_axes)
                 if a[0] == "g"]
        if cands:
            d, gid = max(cands)
            budget = (12 << 20) // (4 * 2 * (K + H) * F)
            want = min(max(1, BLOCK_F // max(1, K * F)), max(1, budget))
            while gt * 2 <= want and d % (gt * 2) == 0:
                gt *= 2
            if gt > 1:
                gb_gid = gid
            else:
                gt = 1
    if n_grid // gt * (F // block) > GRID_CAP:
        return _rej("grid-cap")

    # ---- Y view from iy --------------------------------------------------
    n_legs = [l for l in iy if l in n_legs_set]   # H digit order = iy order
    run_of = {}
    for gid, legs in enumerate(g_runs):
        run_of[legs[0]] = (gid, legs)
    y_axes = []
    view_y = []
    k = 0
    while k < len(iy):
        l = iy[k]
        if l in n_legs_set:
            if tuple(iy[k:k + len(n_legs)]) != tuple(n_legs):
                return _rej("h-contig")
            y_axes.append(("H",))
            view_y.append(H)
            k += len(n_legs)
        elif l in f_set:
            if tuple(iy[k:k + len(f_legs)]) != tuple(f_legs):
                return _rej("f-contig")
            y_axes.append(("f", 0))
            view_y.append(F // fm)
            y_axes.append(("f", 1))
            view_y.append(fm)
            k += len(f_legs)
        else:
            if l not in run_of:
                return _rej("g-split")
            gid, legs = run_of[l]
            if tuple(iy[k:k + len(legs)]) != legs:
                return _rej("g-split")
            y_axes.append(("g", gid))
            view_y.append(_prod(dim_of[x] for x in legs))
            k += len(legs)
    if not any(a[0] == "H" for a in y_axes):
        # H == 1 (W fully contracted): no H axis in the output view
        if H != 1:
            return _rej("h-missing")
    else:
        # H must come before the f run (an H minor axis has bad lanes)
        hy = next(k for k, a in enumerate(y_axes) if a[0] == "H")
        fy = [k for k, a in enumerate(y_axes) if a[0] == "f"]
        if fy and hy > fy[0]:
            return _rej("h-after-f")
    if any(a[0] == "g" for a in y_axes[-2:]):
        return _rej("g-in-tile-y")

    # ---- VMEM fit: qb packing x grid blocking x block size ---------------
    # Audit the REAL windows the kernel will allocate (double-buffered,
    # re/im separate operands, padded to the (8,128) VMEM tile),
    # INCLUDING the qb instances the slice-vmap packs per program and the
    # gt sub-problems one program covers — the per-plain-block budget
    # above misses both multipliers (measured: 161MB scoped VMEM compile
    # abort on the sc25 plan at vmap width 8, qb x gt windows).  Shrink
    # qb, then gt, then the block until the windows fit.
    qb = 1
    while 2 * qb * 2 * K <= 128 and 2 * qb * 2 * H <= 512:
        qb *= 2

    def _win_bytes(qb_, gt_, block_):
        return gk_window_bytes(x_axes, view_x, y_axes, K, H, fm,
                               gb_gid, qb_, gt_, block_)

    while _win_bytes(qb, gt, block) > GK_VMEM_BUDGET:
        if qb > 1:
            qb //= 2
        elif gt > 1:
            gt //= 2
            if gt == 1:
                gb_gid = None
        elif block > fm and F % (block // 2) == 0 and block // 2 >= fm:
            block //= 2
        else:
            return _rej("vmem")
    if n_grid // gt * (F // block) > GRID_CAP:
        return _rej("grid-cap")

    # ---- wk gather (host) ------------------------------------------------
    w_strides = {}
    s = 1
    for l in reversed(ix_w):
        w_strides[l] = s
        s *= dim_of[l]

    def _digits(idx, dims):
        out = []
        rem = idx
        for d in reversed(dims):
            out.append(rem % d)
            rem = rem // d
        out.reverse()
        return out

    hi = np.arange(H, dtype=np.int64)
    h_vals = dict(zip(n_legs, _digits(hi, [dim_of[l] for l in n_legs]))) \
        if n_legs else {}
    ki = np.arange(K, dtype=np.int64)
    k_vals = dict(zip(contract, _digits(ki, [dim_of[l] for l in contract])))
    idx = np.zeros((H, K), dtype=np.int64)
    for l in n_legs:
        idx += h_vals[l][:, None] * w_strides[l]
    for l in contract:
        idx += k_vals[l][None, :] * w_strides[l]

    # ---- cost model / mxu-vs-vpu ----------------------------------------
    # The block (c_1..c_n, bf, 128) reshapes FREELY to (K, bf, 128) inside
    # the kernel (collapsing leading dims leaves the tiled last-two dims
    # untouched), so both compute paths work for arbitrarily scattered
    # contract legs:
    #   vpu   H*K unrolled broadcast-FMAs, padding-free, ~1 TFLOP/s-true
    #   mxu   ONE re/im-packed (2H,2K)@(2K,128) dot per 128-lane column
    #         (the real 2x2 representation of complex multiply folds all
    #         four products into the dot) — pays pad-to-128 on both sides
    y_elems = x_elems // max(K, 1) * H
    flops = 4 * 2 * (x_elems // max(K, 1)) * K * H
    traffic_s = 4 * 2 * (x_elems + y_elems + K * H) / HBM_BYTES_PER_S
    vpu_s = flops / VPU_FLOPS_PER_S
    pad = lambda n: -(-n // 128) * 128
    # qb (computed in the VMEM fit above): under a slice-vmap, qb
    # independent slice instances pack block-diagonally into one
    # (qb*2H, qb*2K) dot — full MXU width at any K (see the custom_vmap
    # batching rule in apply_gk_step)
    mxu_s = (2 * (x_elems // max(K, 1) // fm)
             * pad(qb * 2 * K) * pad(qb * 2 * H) * 128
             / (qb * MXU_FLOPS_PER_S))
    vpu_s *= 128 // fm          # sub-128 lanes waste VPU width too
    vpu_ok = 4 * K * H <= UNROLL_CAP
    use_mxu = (not vpu_ok) or mxu_s < vpu_s
    compute_s = mxu_s if use_mxu else vpu_s
    if not row_mode:
        compute_s += (n_grid // gt) * (F // block) * PROGRAM_OVERHEAD_S \
            / max(qb if use_mxu else 1, 1)
    est_s = max(traffic_s, compute_s)
    if not row_mode:
        est_xla = xla_step_estimate(ix_i, ix_j, iy, dims_i, dims_j)
        if est_s > est_xla * SLACK:
            return _rej("not-better")
    dims_y = tuple(dim_of[l] for l in iy)
    wpos = {l: k for k, l in enumerate(ix_w)}
    return GKPlan(w_is_j, tuple(view_x), tuple(x_axes), tuple(view_y),
                  tuple(y_axes), block, K, H, tuple(c_dims),
                  idx.astype(np.int32), use_mxu, dims_y, flops, est_s,
                  qb, fm, gb_gid, gt,
                  w_dims=tuple(dim_of[l] for l in ix_w),
                  w_perm=tuple(wpos[l] for l in
                               list(n_legs) + list(contract)))


def plan_gk_step_pre(ix_i, ix_j, iy, dims_i, dims_j, pin=0):
    """GK plan for a step whose STORED X order is kernel-hostile (contract
    legs inside the minor run -> 'no-f-run'): permute X once with a cheap
    run-collapsed transpose into a GK-friendly order built FROM iy, then
    run the kernel with iy UNCHANGED — zero downstream layout effects.

    The permuted order is  [X free legs in iy order] + [contract legs] +
    [trailing iy-suffix of X free legs] — by construction the f run is an
    iy-contiguous suffix and every grid run is iy-contiguous, so
    plan_gk_step accepts it whenever the shape caps allow.  The explicit
    pre-reorder costs one extra read+write pass over X (measured XLA copy
    rate ~286 GB/s); the XLA fallback it replaces pays MORE relayout than
    that (dot layout normalization + 4-dot combine copies, measured ~2.2x
    its fused-minimum traffic — docs/BENCH_NOTES.md round-3 profile), so
    the est gate usually clears."""
    if pin:
        return None
    iy = tuple(iy)
    big_is_i = _prod(dims_i) >= _prod(dims_j)
    ix_x = tuple(ix_i if big_is_i else ix_j)
    dims_x = tuple(dims_i if big_is_i else dims_j)
    ix_w = tuple(ix_j if big_is_i else ix_i)
    set_w, set_y, set_x = set(ix_w), set(iy), set(ix_x)
    if len(set_x) != len(ix_x):
        return None
    dim_of = {l: int(d) for l, d in zip(ix_x, dims_x)}
    contract = [l for l in ix_x if l in set_w and l not in set_y]
    frees = {l for l in ix_x if l in set_y}
    if not contract or not frees:
        return None
    # trailing f run: the longest iy-suffix of X free legs, trimmed from
    # the front until its product is lane-complete (fm = 128)
    tail = []
    for l in reversed(iy):
        if l not in frees:
            break
        tail.append(l)
    tail.reverse()
    F = _prod(dim_of[l] for l in tail)
    while tail and F % 128:
        F //= dim_of[tail[0]]
        tail.pop(0)
    # cap the tail at the smallest suffix with F >= the kernel's block
    # budget: beyond that, extra tail legs buy no block size but DO
    # over-constrain px (when px becomes a producer-side output-order
    # demand, a long tail swallows legs the producer needs free to keep
    # its own H/f grouping — measured as producer kernel losses)
    while (len(tail) > 1 and F // dim_of[tail[0]] >= BLOCK_F
            and (F // dim_of[tail[0]]) % 128 == 0):
        F //= dim_of[tail[0]]
        tail.pop(0)
    if not tail:
        return None
    tset = set(tail)
    # gpart keeps X's STORED relative order: this kernel splits grid runs
    # freely (iy-adjacency merging), so the consumer gains nothing from an
    # iy-imposed order — while the minimal perturbation (1) collapses into
    # fewer, larger transpose runs and (2) preserves the PRODUCER's own
    # H/g grouping when the scheme compiler turns px into a producer-side
    # output-order override (see contraction_scheme_sparse pass 2)
    gpart = [l for l in ix_x if l in frees and l not in tset]
    px = tuple(gpart) + tuple(contract) + tuple(tail)
    if px == ix_x:
        return None         # the in-place planner already covers this form
    dims_px = tuple(dim_of[l] for l in px)
    if big_is_i:
        plan = plan_gk_step(px, ix_w, iy, dims_px, dims_j)
    else:
        plan = plan_gk_step(ix_w, px, iy, dims_i, dims_px)
    if plan is None:
        return None
    from .lowering import plan_reorder

    x_elems = _prod(dims_x)
    pos = {l: k for k, l in enumerate(ix_x)}
    r = plan_reorder(dims_x, tuple(pos[l] for l in px), (x_elems,))
    if r.mode != "transpose":
        return None
    # measured (docs/BENCH_NOTES.md round-3 profile): XLA lowers the
    # explicit transpose as TWO full copies — a retile+layout copy off the
    # producer's T(1,128) Pallas output plus a normalize copy at this
    # kernel's input reshape — so charge 2 read+write passes, not 1
    pre_cost = 2 * (2 * 4 * 2 * x_elems) / HBM_BYTES_PER_S
    est_xla = xla_step_estimate(ix_i, ix_j, iy, dims_i, dims_j)
    if plan.est_s + pre_cost > est_xla * SLACK:
        return _rej("pre-not-better")
    from dataclasses import replace

    return replace(plan, pre=r, px=px, est_s=plan.est_s + pre_cost)


# -- gathered gather-K (GGK): ALIGNED both-batched steps --------------------
#
# Aligned-step form (runtime/sparse.py): Y[b, ...] = sum_K X[gi[b], ...]
# . W[gj[b], ...].  The XLA path materializes gathered row copies (take:
# write + re-read), runs an MXU-pad-hostile batch-diagonal dot, chunks
# when batch x operand exceeds the memory budget, and concats the chunks
# — measured ~4x its fused-minimum traffic (round-3 width-sweep autopsy)
# and the source of two OOM classes (padded batch-dot layouts, padded
# chunk copies).  Here the gather indices are SCALAR-PREFETCHED into the
# BlockSpec index maps, so each program's X/W rows DMA straight from the
# source buffers: no gathered copy exists, no chunking is needed, and
# the per-row contraction reuses the gather-K machinery (w4-packed MXU
# dot or unrolled VPU FMAs).  Chip A/B at the aligned hot shape
# (B=512 rows, K=128, F=4096, H=16): 7.0 ms vs 25.0 ms XLA
# (scripts/proto_ggk.py).  No reference analogue: the reference chunks
# gather+einsum per step (artensor/contraction.py:140-175).

GGK_MIN_WORK = MIN_X_ELEMS   # min B * row elements (whole-step size gate)
GGK_WIDTH_ASSUME = 32        # width assumed when amortizing the per-row
                             # program cost in est_s (executor folds the
                             # slice-vmap width into the row blocks)


@dataclass(frozen=True)
class GGKPlan:
    """Static metadata for one gathered (aligned) step."""

    row: GKPlan          # per-row plan (its w_is_j maps row X to op i/j)
    gi: object           # (B,) int32 rows into the big (X) side
    gj: object           # (B,) int32 rows into the small (W) side
    B: int
    bi_rows: int         # stored rows of the X-side operand
    bj_rows: int
    dims_y: tuple        # logical output dims incl. the leading batch
    flops: int
    est_s: float
    @property
    def w_is_j(self):
        return self.row.w_is_j

    @property
    def pre(self):       # uniform interface with GKPlan (no pre reorder)
        return None


RG_ROW_CAP = 1 << 15     # max row elements of the reduction form
RG_H_CAP = 8             # unrolled fresh-leg loop bound
RG_K_MIN = 128           # min contract run (lanes) — below this the
                         # standard GK forms always apply instead


@dataclass(frozen=True)
class RGRow:
    """Reduction-form row plan: near-root aligned rows whose free legs are
    TINY (F < 32 — no lane-complete f run exists in any order, so the
    standard gather-K row form is impossible).  The row is brought to the
    canonical rank-2 (F, K) layout — frees in riy order leading, the big
    contract run MINOR (clean lanes, zero padding) — by ONE whole-buffer
    XLA reorder per slice when the stored order differs (``pre_perm``;
    the gathered rows themselves are never copied).  The contraction is
    then H unrolled multiply-reduces with the sum on the lane axis:
    y[h, f] = sum_k x[f, k] * w[h, k].  MXU forms lose here by 16-64x
    pad waste (H and F are 2-8 while K is 2^11+): this is a pure
    bandwidth-bound reduction."""

    view_x: tuple        # canonical (F, K) — or (K,) when no frees
    H: int
    K: int
    wk_idx: object       # (H, K) int32; K digits in x-stored contract order
    hy_first: bool       # fresh block leads the row output
    dims_y: tuple        # row output dims (riy order)
    w_is_j: bool
    row_dims: tuple      # ORIGINAL stored row dims (for the pre reorder)
    pre_perm: tuple      # row-axis permutation to canonical, or None
    flops: int
    est_s: float
    px: tuple = None     # canonical X leg order (negotiation target for
                         # the producer; None when already canonical)
    wx: tuple = None     # canonical W leg order: fresh (riy order) then
                         # contract in X-stored digit order — a producer
                         # emitting this makes wk_idx the identity and
                         # the wk take disappears (apply_ggk_step)
    w_dims: tuple = None  # stored digit dims / transpose perm: the wk
    w_perm: tuple = None  # take is a digit transpose (see GKPlan)

    pre = None

    @property
    def cls_x(self):
        return ("f", "c") if len(self.view_x) == 2 else ("c",)


def plan_rg_row(rx_i, rx_j, riy, rdims_i, rdims_j):
    """RGRow for the reduction form, or None (sets LAST_REJECT)."""
    big_is_i = _prod(rdims_i) >= _prod(rdims_j)
    if big_is_i:
        w_is_j, ix_x, dims_x, ix_w, dims_w = True, rx_i, rdims_i, rx_j, rdims_j
    else:
        w_is_j, ix_x, dims_x, ix_w, dims_w = False, rx_j, rdims_j, rx_i, rdims_i
    riy = tuple(riy)
    set_x, set_w, set_y = set(ix_x), set(ix_w), set(riy)
    if len(set_x) != len(ix_x) or len(set_y) != len(riy):
        return _rej("rg:dup")
    if set_x & set_w & set_y:
        return _rej("rg:shared-batch")
    dim_of = {l: int(d) for l, d in zip(ix_x, dims_x)}
    for l, d in zip(ix_w, dims_w):
        dim_of[l] = int(d)
    contract = [l for l in ix_x if l in set_w and l not in set_y]
    fresh = [l for l in ix_w if l in set_y]
    frees = [l for l in ix_x if l in set_y]
    if set_w != set(contract) | set(fresh) \
            or len(fresh) + len(contract) != len(ix_w):
        return _rej("rg:w-legs")
    if set_y != set(frees) | set(fresh):
        return _rej("rg:y-legs")
    if not contract:
        return _rej("rg:no-contract")
    xrow = _prod(dims_x)
    if xrow > RG_ROW_CAP:
        return _rej("rg:row-big")
    K = _prod(dim_of[l] for l in contract)
    H = _prod(dim_of[l] for l in fresh)
    if K < RG_K_MIN:
        return _rej("rg:k-small")
    if H > RG_H_CAP:
        return _rej("rg:h-cap")
    if K * H > HK_CAP:
        return _rej("rg:hk-cap")
    # fresh block contiguous at the front or the back of riy (its digit
    # order is free — the wk gather absorbs it); frees in riy order
    fset = set(fresh)
    fresh_y = [l for l in riy if l in fset]
    frees_y = [l for l in riy if l not in fset]
    if fresh_y and riy[:len(fresh_y)] != tuple(fresh_y) \
            and riy[-len(fresh_y):] != tuple(fresh_y):
        return _rej("rg:h-contig")
    hy_first = bool(fresh_y) and riy[:len(fresh_y)] == tuple(fresh_y)
    # canonical row order: frees (riy order) leading, contract (stored
    # order) minor — a whole-buffer reorder when the stored order differs
    px = tuple(frees_y) + tuple(contract)
    pos = {l: k for k, l in enumerate(ix_x)}
    pre_perm = None if px == tuple(ix_x) \
        else tuple(pos[l] for l in px)
    F = _prod(dim_of[l] for l in frees_y)
    view_x = (F, K) if frees_y else (K,)
    # wk gather: K digits in x-stored contract order, H in riy fresh order
    w_strides = {}
    s = 1
    for l in reversed(ix_w):
        w_strides[l] = s
        s *= dim_of[l]

    def _digits(idx, dims):
        out, rem = [], idx
        for d in reversed(dims):
            out.append(rem % d)
            rem = rem // d
        out.reverse()
        return out

    h_order = fresh_y if fresh_y else []
    hi = np.arange(H, dtype=np.int64)
    h_vals = dict(zip(h_order, _digits(hi, [dim_of[l] for l in h_order]))) \
        if h_order else {}
    ki = np.arange(K, dtype=np.int64)
    k_vals = dict(zip(contract, _digits(ki, [dim_of[l] for l in contract])))
    idx = np.zeros((H, K), dtype=np.int64)
    for l in h_order:
        idx += h_vals[l][:, None] * w_strides[l]
    for l in contract:
        idx += k_vals[l][None, :] * w_strides[l]
    flops = 4 * 2 * H * xrow
    # peak-VPU charge.  Round 4 penalized this 4x ("25% VPU efficiency",
    # from the sc22_r2@10k junction where the batch-scaled W traffic —
    # charged separately in plan_ggk_step — was the real cost); the
    # round-5 op-level trace of the 1k hot junction (B=1000, F=8,
    # K=2048, H=2 at width 64) measured the row kernel at 0.11 ms/slice
    # ~= its 0.15 ms traffic bound, i.e. AT peak: the penalty made the
    # row est 10x pessimistic and let measured-slower MXU block forms
    # win the form choice (docs/BENCH_NOTES.md round 5).
    est_s = flops / VPU_FLOPS_PER_S
    dims_y = tuple(dim_of[l] for l in riy)
    wpos = {l: k for k, l in enumerate(ix_w)}
    return RGRow(view_x, H, K, idx.astype(np.int32), hy_first, dims_y,
                 w_is_j, tuple(int(d) for d in dims_x), pre_perm,
                 flops, est_s,
                 px if pre_perm is not None else None,
                 tuple(fresh_y) + tuple(contract),
                 tuple(dim_of[l] for l in ix_w),
                 tuple(wpos[l] for l in list(h_order) + list(contract)))


RGF_ROW_MIN = 128        # min row elements: the flat row rides the lanes
                         # unpadded; shorter rows waste the vector unit
                         # and are cheap for XLA anyway
RGF_MAT_CAP = 1 << 20    # max elements of the static digit-map matrices
                         # (VMEM residents, fetched once per program run)


@dataclass(frozen=True)
class RGFlat:
    """Flat-row reduction plan: aligned per-row contractions whose shape
    fits NO other kernel form — small scattered contract runs (K below
    RG_K_MIN) and interleaved free legs, e.g. the 10k batch-junction rows
    (4, 32, 4) x (32,) -> (4, 4) that the XLA fallback executes as
    chunked `take` + einsum + concat passes (the single largest copy
    class of the 10k profile: materialized gather copies anchor W-minor
    layouts and relayout every kernel boundary around them,
    docs/BENCH_NOTES.md round 5; reference executor being replaced:
    /root/reference/artensor/contraction.py:140-175).

    The row is DMA'd RAW — view (xrow,), minor dim = the whole stored
    row, no canonical pre-reorder pass over HBM and no sublane padding —
    and the digit bookkeeping happens IN the kernel without any VMEM
    reshape (Mosaic rejects high-rank shape casts on the chip:
    "infer-vector-layout: unsupported shape cast").  Two static 0/1
    matrices carry the digit maps: ``e_mat`` (K, xrow) expands the
    (Bj, H, K)-prepared W row onto the stored address space
    (wexp = w_h @ E), and ``m_mat`` (xrow, F) sums the elementwise
    product back out (y_h = (x * wexp) @ M).  Both dots are tiny MXU
    ops on flat operands.  Compute is negligible for these shapes; the
    kernel exists to make the TRAFFIC minimal (one run-elided pass over
    the gathered rows) and to remove the XLA gather ops whose W-minor
    layout preference taxes neighbouring steps."""

    view_x: tuple        # (xrow,) — the flat stored row
    row_dims: tuple      # stored row dims (documentation / debugging)
    e_mat: object        # (K, xrow) f32 0/1: k -> stored addresses
    m_mat: object        # (xrow, F) f32 0/1: stored address -> free cell
    H: int
    K: int
    F: int
    wk_idx: object       # (H, K) int32 — same contract-digit convention
    hy_first: bool       # H==1 or the fresh block leads the flat output
    dims_y: tuple
    w_is_j: bool
    flops: int
    est_s: float
    w_dims: tuple = None   # wk lowering as a digit transpose (see GKPlan)
    w_perm: tuple = None
    px = None            # no producer negotiation target (no pre pass)
    pre_perm = None

    @property
    def pre(self):       # uniform interface with GKPlan (no pre reorder)
        return None


def plan_rg_flat(rx_i, rx_j, riy, rdims_i, rdims_j):
    """RGFlat for a degenerate aligned row, or None (sets LAST_REJECT)."""
    big_is_i = _prod(rdims_i) >= _prod(rdims_j)
    if big_is_i:
        w_is_j, ix_x, dims_x, ix_w, dims_w = True, rx_i, rdims_i, rx_j, rdims_j
    else:
        w_is_j, ix_x, dims_x, ix_w, dims_w = False, rx_j, rdims_j, rx_i, rdims_i
    riy = tuple(riy)
    set_x, set_w, set_y = set(ix_x), set(ix_w), set(riy)
    if len(set_x) != len(ix_x) or len(set_y) != len(riy):
        return _rej("rgf:dup")
    if set_x & set_w & set_y:
        return _rej("rgf:shared-batch")
    dim_of = {l: int(d) for l, d in zip(ix_x, dims_x)}
    for l, d in zip(ix_w, dims_w):
        dim_of[l] = int(d)
    contract = [l for l in ix_x if l in set_w and l not in set_y]
    fresh = [l for l in ix_w if l in set_y]
    frees = [l for l in ix_x if l in set_y]
    if set_w != set(contract) | set(fresh) \
            or len(fresh) + len(contract) != len(ix_w):
        return _rej("rgf:w-legs")
    if set_y != set(frees) | set(fresh):
        return _rej("rgf:y-legs")
    if not contract:
        return _rej("rgf:no-contract")
    xrow = _prod(dims_x)
    if xrow < RGF_ROW_MIN:
        return _rej("rgf:row-small")
    if xrow > RG_ROW_CAP:
        return _rej("rgf:row-big")
    K = _prod(dim_of[l] for l in contract)
    H = _prod(dim_of[l] for l in fresh)
    F = _prod(dim_of[l] for l in frees)
    if H > RG_H_CAP:
        return _rej("rgf:h-cap")
    if K * H > HK_CAP:
        return _rej("rgf:hk-cap")
    # the flat output row is stored in x free-digit order: riy's frees
    # must match the stored order, and the fresh block (digit order free
    # via the wk gather) must be contiguous and LEADING (its store is a
    # static flat slice per h)
    fset = set(fresh)
    fresh_y = [l for l in riy if l in fset]
    frees_y = [l for l in riy if l not in fset]
    if frees_y != frees:
        return _rej("rgf:f-order")
    if fresh_y and riy[:len(fresh_y)] != tuple(fresh_y):
        return _rej("rgf:h-lead")
    # wk gather: identical digit convention to plan_rg_row
    w_strides = {}
    s = 1
    for l in reversed(ix_w):
        w_strides[l] = s
        s *= dim_of[l]

    def _digits(idx, dims):
        out, rem = [], idx
        for d in reversed(dims):
            out.append(rem % d)
            rem = rem // d
        out.reverse()
        return out

    hi = np.arange(H, dtype=np.int64)
    h_vals = dict(zip(fresh_y, _digits(hi, [dim_of[l] for l in fresh_y]))) \
        if fresh_y else {}
    ki = np.arange(K, dtype=np.int64)
    k_vals = dict(zip(contract, _digits(ki, [dim_of[l] for l in contract])))
    idx = np.zeros((H, K), dtype=np.int64)
    for l in fresh_y:
        idx += h_vals[l][:, None] * w_strides[l]
    for l in contract:
        idx += k_vals[l][None, :] * w_strides[l]
    # static digit-map matrices: stored address -> (k, f) coordinates
    if K * xrow > RGF_MAT_CAP or xrow * max(F, 1) > RGF_MAT_CAP:
        return _rej("rgf:mat-cap")
    addr = np.arange(xrow, dtype=np.int64)
    digs = _digits(addr, list(dims_x))
    dig_of = dict(zip(ix_x, digs))
    k_stride = {}
    s = 1
    for l in reversed(contract):
        k_stride[l] = s
        s *= dim_of[l]
    f_stride = {}
    s = 1
    for l in reversed(frees):
        f_stride[l] = s
        s *= dim_of[l]
    k_of = sum((dig_of[l] * k_stride[l] for l in contract),
               np.zeros(xrow, dtype=np.int64))
    f_of = sum((dig_of[l] * f_stride[l] for l in frees),
               np.zeros(xrow, dtype=np.int64))
    e_mat = (np.arange(K)[:, None] == k_of[None, :]).astype(np.float32)
    m_mat = (f_of[:, None] == np.arange(max(F, 1))[None, :]) \
        .astype(np.float32)
    flops = 4 * 2 * H * xrow
    est_s = flops / VPU_FLOPS_PER_S
    dims_y = tuple(dim_of[l] for l in riy)
    wpos = {l: k for k, l in enumerate(ix_w)}
    return RGFlat((xrow,), tuple(int(d) for d in dims_x), e_mat, m_mat,
                  H, K, F, idx.astype(np.int32), True, dims_y, w_is_j,
                  flops, est_s,
                  tuple(dim_of[l] for l in ix_w),
                  tuple(wpos[l] for l in list(fresh_y) + list(contract)))


def plan_ggk_step(rx_i, rx_j, riy, rdims_i, rdims_j, gi, gj,
                  bi_rows, bj_rows):
    """GGKPlan for an aligned step, or None.  ``rx_*``/``riy`` are the
    ROW-level label orders (shared batch label stripped); ``gi``/``gj``
    the UNCHUNKED per-target gather rows into operands i and j."""
    B = len(gi)
    if B != len(gj):
        return _rej("ggk:gather-mismatch")
    big_is_i = _prod(rdims_i) >= _prod(rdims_j)
    xrow = _prod(rdims_i) if big_is_i else _prod(rdims_j)
    wrow = _prod(rdims_j) if big_is_i else _prod(rdims_i)
    if B * xrow < GGK_MIN_WORK:
        return _rej("ggk:small")
    if wrow > HK_CAP:
        return _rej("ggk:w-big")
    row = plan_gk_step(rx_i, rx_j, riy, rdims_i, rdims_j, row_mode=True)
    if row is None:
        note = LAST_REJECT
        row = plan_rg_row(rx_i, rx_j, riy, rdims_i, rdims_j)
        if row is None:
            note = f"{note}/{LAST_REJECT}"
            row = plan_rg_flat(rx_i, rx_j, riy, rdims_i, rdims_j)
        if row is None:
            return _rej(f"ggk:row-{note}/{LAST_REJECT}")
    yrow = _prod(row.dims_y)
    n_row_grid = B if isinstance(row, (RGRow, RGFlat)) else B * max(
        1, _prod(row.view_x[k] for k, a in enumerate(row.x_axes)
                 if a[0] == "g"))
    if n_row_grid > GRID_CAP * 4:
        return _rej("ggk:grid-cap")
    unit = 4.0 * 2
    # W rows are pre-arranged once to (Bj, H, K) via the static wk gather;
    # a reduction row's canonical (F, K) layout costs one whole-buffer
    # reorder (2 read+write passes, matching the measured pre-GK rate)
    pre_elems = 0
    if isinstance(row, RGRow) and row.pre_perm is not None:
        pre_elems = 2 * 2 * (bi_rows if big_is_i else bj_rows) * xrow
    # DMA elision: Mosaic re-fetches a block window only when its index
    # map CHANGES between consecutive programs, so adjacent-equal gather
    # rows (the compiler lexsorts targets for this, runtime/sparse.py)
    # are fetched once.  The W window ignores the inner row grid (its
    # index is row-constant), so W always pays one fetch per RUN of equal
    # gj; the X window additionally needs one-program-per-row (the
    # reduction form, or a single-block GK row) to elide across rows.
    gx_ = np.asarray(gi if big_is_i else gj)
    gw_ = np.asarray(gj if big_is_i else gi)
    runs_x = 1 + int((gx_[1:] != gx_[:-1]).sum()) if B > 1 else B
    runs_w = 1 + int((gw_[1:] != gw_[:-1]).sum()) if B > 1 else B
    if isinstance(row, (RGRow, RGFlat)):
        n_inner = 1
    else:
        bf_ = row.block // row.fm
        F_units_ = next(row.view_x[k] for k, a in enumerate(row.x_axes)
                        if a == ("f", 0))
        n_inner = (F_units_ // bf_) * max(1, _prod(
            row.view_x[k] for k, a in enumerate(row.x_axes)
            if a[0] == "g"))
    fetch_x = runs_x if n_inner == 1 else B
    # the wk take (stored W rows -> (Bj, H, K) in X's contract-digit
    # order) and the RGRow canonical pre-reorder are XLA passes SERIAL
    # with the kernel — additive, not hidden under the roofline max —
    # and the wk take vanishes entirely when the producer already emits
    # the canonical order (wk_idx identity: negotiation's target)
    wk_ident = bool(np.array_equal(row.wk_idx.ravel(),
                                   np.arange(row.wk_idx.size)))
    # the wk relayout lowers as a digit TRANSPOSE (one read + one write
    # pass; _wk_transpose), not a gather — 2 passes, and zero when the
    # producer already emits the canonical order
    wk_s = 0.0 if wk_ident else unit * 2 \
        * (bj_rows if big_is_i else bi_rows) * wrow / HBM_BYTES_PER_S
    traffic_s = unit * (fetch_x * xrow + runs_w * wrow + B * yrow) \
        / HBM_BYTES_PER_S
    pre_s = unit * pre_elems / HBM_BYTES_PER_S
    base_s = max(traffic_s, B * row.est_s) \
        + B * PROGRAM_OVERHEAD_S / GGK_WIDTH_ASSUME
    est_s = base_s + wk_s + pre_s
    # the XLA alternative: gathered-batch dot + 2 take passes per operand.
    # The batch-diagonal dot pads every per-row (F, K) x (K, H) problem
    # to full MXU tiles — at tiny F/H that padding dominates its runtime
    # (step173-class shape measured 16.5 ms/slice vs 0.36 ms fused-min
    # traffic, scripts/proto_rg.py)
    blab = object()
    xla = xla_step_estimate(
        (blab, *rx_i), (blab, *rx_j), (blab, *riy),
        (B, *rdims_i), (B, *rdims_j))
    xla += unit * 2 * B * (xrow + wrow) / HBM_BYTES_PER_S
    Fx, Hw = xrow // max(row.K, 1), wrow // max(row.K, 1)
    tiles = lambda n: -(-n // 128)
    pad_cycles = B * tiles(Fx) * tiles(row.K) * tiles(Hw) * 128
    xla = max(xla, pad_cycles / MXU_CLOCK_HZ)
    if est_s > xla * SLACK:
        return _rej("ggk:not-better")
    flops = 4 * 2 * B * (xrow // max(row.K, 1)) * row.K * row.H
    gx = np.asarray(gi if big_is_i else gj, dtype=np.int32)
    gw = np.asarray(gj if big_is_i else gi, dtype=np.int32)
    return GGKPlan(row, gx, gw, B,
                   bi_rows if big_is_i else bj_rows,
                   bj_rows if big_is_i else bi_rows,
                   (B, *row.dims_y), flops, est_s)


def _ggk_specs(plan, width, n_chunks=1, w_batched=True):
    """(grid, xspec, wspec, yspec) — ``width`` 0 = unbatched, else the
    per-program slice-vmap width folded into a leading block dim.

    ``n_chunks`` > 1 adds a leading GRID axis over width chunks (total
    vmap width = n_chunks * width): the kernel walks the chunks with
    direct block DMAs instead of the lax.map staging that materialized
    dynamic-slice/update-slice passes over every operand (profiled at
    ~0.14 s/run on the round-3 headline — docs/BENCH_NOTES.md round 4).
    ``w_batched`` False = the small operand is slice-invariant and caries
    NO width axis; every program reads the same (1, H, K) window."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    row = plan.row
    bf = row.block // row.fm
    F_units = next(row.view_x[k] for k, a in enumerate(row.x_axes)
                   if a == ("f", 0))
    row_grid = tuple(row.view_x[k] for k, a in enumerate(row.x_axes)
                     if a[0] == "g") + (F_units // bf,)
    nc = 1 if n_chunks > 1 else 0
    grid = ((n_chunks,) if nc else ()) + (plan.B,) + row_grid
    g_pos = {}
    for kind, gid in row.x_axes:
        if kind == "g":
            g_pos[gid] = 1 + len(g_pos)          # grid slot (b leads)
    nb = 1 if width else 0

    def lead_of(gids):
        # leading width-block coordinate: the chunk id when chunked
        if not nb:
            return ()
        return (gids[0],) if nc else (0,)

    xblock = [width] if nb else []
    xblock.append(1)                             # the gathered row
    for k, (kind, gid) in enumerate(row.x_axes):
        if kind == "c":
            xblock.append(row.view_x[k])
        elif kind == "g":
            xblock.append(None)                  # squeezed grid dim
        elif (kind, gid) == ("f", 0):
            xblock.append(bf)
        else:
            xblock.append(row.fm)

    def x_index(*args):
        gids, gi_ref = args[:-2], args[-2]
        out = [gi_ref[gids[nc]]]
        for kind, gid in row.x_axes:
            if kind == "c":
                out.append(0)
            elif kind == "g":
                out.append(gids[nc + g_pos[gid]])
            elif gid == 0:
                out.append(gids[-1])
            else:
                out.append(0)
        return lead_of(gids) + tuple(out)

    wblock = ([width] if nb and w_batched else []) + [1, row.H, row.K]

    def w_index(*args):
        gids, gj_ref = args[:-2], args[-1]
        lead = lead_of(gids) if w_batched else ()
        return lead + (gj_ref[gids[nc]], 0, 0)

    yblock = [width] if nb else []
    yblock.append(1)
    for a in row.y_axes:
        if a[0] == "g":
            yblock.append(None)
        elif a[0] == "H":
            yblock.append(row.H)
        elif a == ("f", 0):
            yblock.append(bf)
        else:
            yblock.append(row.fm)

    def y_index(*args):
        gids = args[:-2]
        out = [gids[nc]]
        for a in row.y_axes:
            if a[0] == "g":
                out.append(gids[nc + g_pos[a[1]]])
            elif a[0] == "H":
                out.append(0)
            elif a == ("f", 0):
                out.append(gids[-1])
            else:
                out.append(0)
        return lead_of(gids) + tuple(out)

    mk = lambda b, f: pl.BlockSpec(tuple(b), f, memory_space=pltpu.VMEM)
    return grid, mk(xblock, x_index), mk(wblock, w_index), \
        mk(yblock, y_index)


def _ggk_kernel(gi_ref, gj_ref, xr_ref, xi_ref, wr_ref, wi_ref,
                or_ref, oi_ref, *, plan, width, precision=None,
                w_batched=True):
    row = plan.row
    K = row.K
    bf = row.block // row.fm
    W = max(width, 1)
    Ww = W if w_batched else 1
    # window: (width?, 1, c..., bf, fm) -> (W, K, bf, fm); collapsing
    # leading dims leaves the tiled minor dims untouched
    xr = xr_ref[...].reshape(W, K, bf, row.fm)
    xi = xi_ref[...].reshape(W, K, bf, row.fm)
    wr = wr_ref[...].reshape(Ww, row.H, K)
    wi = wi_ref[...].reshape(Ww, row.H, K)
    for s in range(W):
        lead = (s, 0) if width else (0,)
        sw = s if w_batched else 0

        def put(h_sel, fi, re, im, lead=lead):
            or_ref[_store_idx(row, 0, h_sel, fi, lead=lead)] = re
            oi_ref[_store_idx(row, 0, h_sel, fi, lead=lead)] = im

        _gk_body(row, xr[s], xi[s], wr[sw], wi[sw], put, precision)


def _rg_wshape(row):
    """W's per-h storage view: K minor, a size-1 broadcast axis over the
    frees — prepared OUTSIDE the kernel (a free XLA reshape of the
    (Bj, H, K) buffer), so the kernel broadcast-multiplies with NO
    in-VMEM relayout.  RGFlat keeps (K,): its broadcast reshape happens
    on the VMEM block against the stored row dims."""
    if isinstance(row, RGFlat):
        return (row.K,)
    return (1, row.K) if len(row.view_x) == 2 else (row.K,)


def _rg_pad(view):
    """Mosaic requires the LAST TWO block dims to be 8/128-divisible or
    equal to the array dims; a rank-1 row view would put the gathered
    row axis (block size 1) second-minor, which fails that check on the
    chip (interpret mode never sees it).  Pad with a leading unit axis
    so the block's last two dims always equal the array's."""
    view = tuple(view)
    return view if len(view) >= 2 else (1,) + view


def _rg_specs(plan, width, n_chunks=1, w_batched=True):
    """Specs for the reduction-form row: grid (B,), whole-row blocks.
    ``n_chunks``/``w_batched`` as in _ggk_specs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    row = plan.row
    nb = 1 if width else 0
    nc = 1 if n_chunks > 1 else 0
    view_x = _rg_pad(row.view_x)
    view_y = _rg_pad(_rg_view_y(row))
    nx = len(view_x)
    ny = len(view_y)
    wshape = _rg_wshape(row)

    def lead_of(gids):
        if not nb:
            return ()
        return (gids[0],) if nc else (0,)

    def x_index(*args):
        gids, gi_ref = args[:-2], args[-2]
        return lead_of(gids) + (gi_ref[gids[nc]],) + (0,) * nx

    def w_index(*args):
        gids, gj_ref = args[:-2], args[-1]
        lead = lead_of(gids) if w_batched else ()
        return lead + (gj_ref[gids[nc]], 0) + (0,) * len(wshape)

    def y_index(*args):
        gids = args[:-2]
        return lead_of(gids) + (gids[nc],) + (0,) * ny

    lead = [width] if nb else []
    wlead = [width] if nb and w_batched else []
    mk = lambda bl, f: pl.BlockSpec(tuple(bl), f, memory_space=pltpu.VMEM)
    return (((n_chunks,) if nc else ()) + (plan.B,),
            mk(lead + [1, *view_x], x_index),
            mk(wlead + [1, row.H, *wshape], w_index),
            mk(lead + [1, *view_y], y_index))


def _rg_view_y(row):
    """Physical output-row view: fresh block (H) leading or trailing the
    free block, matching ``row.dims_y``'s order.  RGFlat stores the row
    flat (h-major, static slice per h)."""
    if isinstance(row, RGFlat):
        y = _prod(row.dims_y)
        return (y,) if y else (1,)
    F = row.view_x[0] if len(row.view_x) == 2 else 0
    if row.H == 1:
        return (F,) if F else (1,)
    if not F:
        return (row.H,)
    return (row.H, F) if row.hy_first else (F, row.H)


def _rg_kernel(gi_ref, gj_ref, xr_ref, xi_ref, wr_ref, wi_ref,
               or_ref, oi_ref, *, plan, width, precision=None,
               w_batched=True):
    import jax.numpy as jnp

    row = plan.row
    H = row.H
    W = max(width, 1)
    Ww = W if w_batched else 1
    view = row.view_x          # canonical (F, K) or (K,)
    two = len(view) == 2
    wshape = _rg_wshape(row)
    xr_all = xr_ref[...].reshape((W,) + view)
    xi_all = xi_ref[...].reshape((W,) + view)
    # W window is PRE-SHAPED (outside the kernel) to (H, *wshape): K on
    # the lanes, a size-1 broadcast axis over the frees — the multiply
    # below is a pure broadcast, no in-VMEM relayout
    wr_all = wr_ref[...].reshape((Ww, H) + wshape)
    wi_all = wi_ref[...].reshape((Ww, H) + wshape)
    for s in range(W):
        xr, xi = xr_all[s], xi_all[s]
        sw = s if w_batched else 0
        for h in range(H):
            whr = wr_all[sw, h]
            whi = wi_all[sw, h]
            re = (xr * whr - xi * whi).sum(axis=-1)   # (F,) or ()
            im = (xr * whi + xi * whr).sum(axis=-1)
            lead = (s, 0) if width else (0,)
            if H == 1:
                idx = lead + (slice(None),)
                re, im = re.reshape(or_ref[idx].shape), \
                    im.reshape(oi_ref[idx].shape)
            elif not two:
                idx = lead + (0, h)     # (1, H)-padded output block
            elif row.hy_first:
                idx = lead + (h, slice(None))
            else:
                idx = lead + (slice(None), h)
            or_ref[idx] = re
            oi_ref[idx] = im


def _rgflat_kernel(gi_ref, gj_ref, xr_ref, xi_ref, wr_ref, wi_ref,
                   e_ref, m_ref, or_ref, oi_ref, *, plan, width,
                   precision=None, w_batched=True):
    """Flat-row reduction with NO VMEM reshapes beyond unit-dim collapse
    (Mosaic rejects high-rank shape casts on the chip): the digit maps
    live in two static 0/1 matrices — wexp = w_h @ E places W's values
    at their stored addresses, y_h = (x * wexp) @ M sums each free cell.
    Both dots are tiny MXU ops on flat 2-D operands."""
    import jax.numpy as jnp
    from jax import lax

    row = plan.row
    W = max(width, 1)
    Ww = W if w_batched else 1
    xrow = row.view_x[0]
    F = max(row.F, 1)
    xr = xr_ref[...].reshape(W, xrow)
    xi = xi_ref[...].reshape(W, xrow)
    wr = wr_ref[...].reshape(Ww, row.H, row.K)
    wi = wi_ref[...].reshape(Ww, row.H, row.K)
    E = e_ref[...]
    M = m_ref[...]
    dn = (((1,), (0,)), ((), ()))
    dot = lambda a, b: lax.dot_general(
        a, b, dn, precision=precision, preferred_element_type=jnp.float32)
    for h in range(row.H):
        wexr = dot(wr[:, h, :], E)       # (Ww, xrow)
        wexi = dot(wi[:, h, :], E)
        pr = xr * wexr - xi * wexi       # broadcasts when Ww == 1
        pi = xr * wexi + xi * wexr
        yr = dot(pr, M)                  # (W, F)
        yi = dot(pi, M)
        sl = slice(h * F, (h + 1) * F)
        if width:
            or_ref[(slice(None), 0, 0, sl)] = yr
            oi_ref[(slice(None), 0, 0, sl)] = yi
        else:
            or_ref[(0, 0, sl)] = yr.reshape(F)
            oi_ref[(0, 0, sl)] = yi.reshape(F)


def _ggk_call(plan, interpret, width, precision,
              xr, xi, wr, wi, wc=None, w_batched=True):
    """One pallas_call; operands (width?, Bi, *view_x) / (width?, Bj, H, K).

    ``wc`` (default ``width``) is the per-program width block; when it
    divides ``width`` strictly the width is walked by a leading GRID axis
    of ``width // wc`` chunks — direct block DMAs, no staging copies.
    ``w_batched`` False = wr/wi carry no width axis (slice-invariant)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    row = plan.row
    wc = width if wc is None else wc
    n_chunks = (width // wc) if width and wc else 1
    extra_arrays = ()
    extra_specs = []
    if isinstance(row, (RGRow, RGFlat)):
        grid, xspec, wspec, yspec = _rg_specs(plan, wc, n_chunks, w_batched)
        view_y = _rg_pad(_rg_view_y(row))
        if isinstance(row, RGFlat):
            kern = _rgflat_kernel
            mk0 = lambda shape: pl.BlockSpec(
                shape, lambda *a: (0, 0), memory_space=pltpu.VMEM)
            extra_specs = [mk0(row.e_mat.shape), mk0(row.m_mat.shape)]
            extra_arrays = (jnp.asarray(row.e_mat), jnp.asarray(row.m_mat))
        else:
            kern = _rg_kernel
    else:
        grid, xspec, wspec, yspec = _ggk_specs(plan, wc, n_chunks, w_batched)
        view_y = row.view_y
        kern = _ggk_kernel
    w_ = max(width, 1)
    lead = (width,) if width else ()
    out_shape = jax.ShapeDtypeStruct(lead + (plan.B,) + tuple(view_y),
                                     jnp.float32)
    traffic = 4 * 2 * plan.B * (
        w_ * (_prod(row.view_x) + _prod(view_y))
        + (w_ if w_batched else 1) * row.K * row.H)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=grid,
        in_specs=[xspec, xspec, wspec, wspec, *extra_specs],
        out_specs=(yspec, yspec))
    return pl.pallas_call(
        partial(kern, plan=plan, width=wc, precision=precision,
                w_batched=w_batched),
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=plan.flops * w_, bytes_accessed=traffic,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(plan.gi), jnp.asarray(plan.gj), xr, xi, wr, wi,
      *extra_arrays)


def ggk_window_bytes(plan, width, w_batched=True):
    """Padded VMEM bytes of the (double-buffered) block windows at a
    given folded width.  ``w_batched`` False = the W window carries no
    width axis (slice-invariant small operand)."""
    from .lanes import _padded_elems

    row = plan.row
    w_ = max(width, 1)
    ww = w_ if w_batched else 1
    if isinstance(row, (RGRow, RGFlat)):
        mats = 0
        if isinstance(row, RGFlat):     # E/M residents, single-buffered
            mats = 4 * (_padded_elems(list(row.e_mat.shape))
                        + _padded_elems(list(row.m_mat.shape))) // 2
        return mats + 4 * 2 * 2 * (
            _padded_elems([w_, 1, *_rg_pad(row.view_x)])
            + _padded_elems([ww, 1, row.H, *_rg_wshape(row)])
            + _padded_elems([w_, 1, *_rg_pad(_rg_view_y(row))]))
    bf = row.block // row.fm
    xw = [w_, 1]
    for k, (kind, gid) in enumerate(row.x_axes):
        if kind == "c":
            xw.append(row.view_x[k])
        elif kind == "g":
            continue
        elif gid == 0:
            xw.append(bf)
        else:
            xw.append(row.fm)
    wwin = [ww, 1, row.H, row.K]
    yw = [w_, 1]
    for a in row.y_axes:
        if a[0] == "g":
            continue
        elif a[0] == "H":
            yw.append(row.H)
        elif a == ("f", 0):
            yw.append(bf)
        else:
            yw.append(row.fm)
    return 4 * 2 * 2 * (_padded_elems(xw) + _padded_elems(wwin)
                        + _padded_elems(yw))


def apply_ggk_step(field, x, y, plan, interpret=None):
    """Execute one aligned step via the GGK kernel (traceable).  Under
    jax.vmap the slice width folds into a leading BLOCK dim (one DMA of
    width rows per operand per program); widths whose windows exceed the
    VMEM budget are chunked with lax.map."""
    import jax
    import jax.numpy as jnp

    from .lanes import kernel_precision
    from .lowering import physical_shape

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    precision = kernel_precision(field)
    row = plan.row
    xv, wv = (x, y) if row.w_is_j else (y, x)
    if isinstance(row, RGRow) and row.pre_perm is not None:
        # one whole-buffer reorder to the canonical (F, K) row layout —
        # the gathered rows themselves are never copied
        from .lowering import apply_reorder, plan_reorder
        r = plan_reorder((plan.bi_rows,) + row.row_dims,
                         (0,) + tuple(p + 1 for p in row.pre_perm),
                         (plan.bi_rows * _prod(row.row_dims),))
        xv = apply_reorder(field, xv, r)
    idx_flat = jnp.asarray(plan.row.wk_idx.reshape(-1))
    # the wk take disappears when the producer already emits W rows in
    # the canonical (H, K-in-X-contract-digit) order — the negotiation
    # pass requests exactly this order from flexible producers
    wk_ident = bool(np.array_equal(plan.row.wk_idx.ravel(),
                                   np.arange(plan.row.wk_idx.size)))
    # reduction rows carry W pre-shaped to (Bj, H, *contract-runs-with-1s)
    # so the kernel's broadcast-multiply needs no in-VMEM relayout
    w_view = (row.H,) + _rg_wshape(row) if isinstance(row, RGRow) \
        else (row.H, row.K)
    x_view = _rg_pad(row.view_x) if isinstance(row, (RGRow, RGFlat)) \
        else row.view_x

    def _wk(w, lead=()):
        rows = (plan.bj_rows,)
        if wk_ident:
            return w.reshape(lead + rows + w_view)
        if row.w_dims is not None:
            return _wk_transpose(w, lead, plan.bj_rows, row, w_view)
        ax = len(lead)
        return jnp.take(w.reshape(lead + rows + (-1,)), idx_flat,
                        axis=ax + 1).reshape(lead + rows + w_view)

    @jax.custom_batching.custom_vmap
    def ggk(xr, xi, wr, wi):
        # w rows -> (Bj, H, K) via the static per-row wk gather
        whr, whi = _wk(wr), _wk(wi)
        xrv = xr.reshape((plan.bi_rows,) + x_view)
        xiv = xi.reshape((plan.bi_rows,) + x_view)
        yr, yi = _ggk_call(plan, interpret, 0, precision,
                           xrv, xiv, whr, whi)
        return yr, yi

    @ggk.def_vmap
    def ggk_vmap(axis_size, in_batched, xr, xi, wr, wi):
        W = axis_size
        xbat = in_batched[0] or in_batched[1]
        wbat = in_batched[2] or in_batched[3]
        if not xbat:
            xr = jnp.broadcast_to(xr[None], (W,) + xr.shape)
            xi = jnp.broadcast_to(xi[None], (W,) + xi.shape)
        if wbat:
            whr, whi = _wk(wr, (W,)), _wk(wi, (W,))
        else:
            # slice-invariant small operand (e.g. a folded gate block):
            # gather it ONCE and let every program read the same window —
            # round-3 broadcast-then-take materialized W copies of it
            # (profiled ~60 ms/run of take + relayout on the headline)
            whr, whi = _wk(wr), _wk(wi)
        xrv = xr.reshape((W, plan.bi_rows) + x_view)
        xiv = xi.reshape((W, plan.bi_rows) + x_view)
        # fold the width into the block windows while they fit VMEM;
        # beyond that, walk width chunks with a leading grid axis
        wc = W
        while wc > 1 and (ggk_window_bytes(plan, wc, wbat) > GK_VMEM_BUDGET
                          or W % wc):
            wc //= 2
        yr, yi = _ggk_call(plan, interpret, W, precision,
                           xrv, xiv, whr, whi, wc=wc, w_batched=wbat)
        return (yr, yi), (True, True)

    yr, yi = ggk(xv[0].reshape(-1), xv[1].reshape(-1),
                 wv[0].reshape(-1), wv[1].reshape(-1))
    return field.reshape((yr, yi), physical_shape(plan.dims_y))


F_PROTECT = 1 << 10      # min tail-run elements kept minor before a
                         # consumer-contract leg may stop its growth


def gk_output_order(ix_i, ix_j, iy_set, dims_i, dims_j, pin=0,
                    consumer_contract=()):
    """The GK-natural output order: pinned prefix, then the CONSUMER's
    contract legs (so the consumer sees them leading — a long minor free
    run and, when they stay contiguous, an MXU-eligible contiguous K), then
    X's remaining free legs in storage order with the fresh W legs inserted
    before the trailing free run.  For a GK-executed step every hoist is a
    grid-leg relabel — zero data movement — which is what breaks the
    round-2 chicken-and-egg (consumers could not kernel-plan because
    producers had not hoisted, and hints were only delivered to planned
    consumers).

    The trailing run stops growing at a consumer-contract leg once it has
    ``F_PROTECT`` elements: enough minor run for efficient DMA blocks,
    everything above it hoistable (the round-2 advisor flagged the v1
    F_MIN = 2^30 as effectively disabling this hoist)."""
    big_is_i = _prod(dims_i) >= _prod(dims_j)
    ix_x = ix_i if big_is_i else ix_j
    ix_w = ix_j if big_is_i else ix_i
    dims_x = dims_i if big_is_i else dims_j
    dim_of = {l: int(d) for l, d in zip(ix_x, dims_x)}
    set_w = set(ix_w)
    pinned = list(ix_x[:pin])
    free = [l for l in ix_x[pin:] if l in iy_set]
    new = [l for l in ix_w if l in iy_set and l not in set(ix_x)]
    cset = {l for l in ix_x if l in set_w and l not in iy_set}
    ccset = set(consumer_contract)
    # trailing free run: stop at contract legs always, at consumer-contract
    # legs once F_PROTECT elements are minor
    n_f = 0
    F = 1
    for l in reversed(ix_x[pin:]):
        if l in cset or (F >= F_PROTECT and l in ccset):
            break
        n_f += 1
        F *= dim_of.get(l, 2)
    tail = [l for l in ix_x[len(ix_x) - n_f:] if l in iy_set] if n_f else []
    tset = set(tail)
    hoist = [l for l in free if l in ccset and l not in tset]
    rest = [l for l in free if l not in ccset and l not in tset]
    new_sorted = [l for l in new if l in ccset] \
        + [l for l in new if l not in ccset]
    # the fresh-leg (H) run is contiguous either way; put it early when the
    # consumer contracts any of it (fresh legs are gate-output wires and
    # usually get consumed next)
    if any(l in ccset for l in new):
        return tuple(pinned + hoist + new_sorted + rest + tail)
    return tuple(pinned + hoist + rest + new_sorted + tail)


# -- execution -------------------------------------------------------------

def _build_wk(w_flat, plan):
    import jax.numpy as jnp

    return jnp.take(w_flat.reshape((-1,)), jnp.asarray(plan.wk_idx))


def _wk_transpose(w, lead, rows, row, w_view):
    """The wk relayout as reshape -> transpose -> reshape: wk_idx is
    built purely from digit strides (plan_gk_step / plan_rg_row), so it
    is always a digit TRANSPOSE of W's stored row — XLA lowers a
    transpose as one copy where the equivalent jnp.take lowers as a
    (bandwidth-hostile) gather.  ``lead`` = leading batch dims (e.g. the
    slice-vmap width), ``rows`` = stored W rows, ``w_view`` = target row
    view (prod = H*K)."""
    n = len(lead) + 1
    perm = tuple(range(n)) + tuple(n + p for p in row.w_perm)
    return w.reshape(lead + (rows,) + tuple(row.w_dims)) \
        .transpose(perm).reshape(lead + (rows,) + tuple(w_view))


def _block_axes(plan):
    """Axes present in the kernel's x block (squeezed 'g' dropped; the
    blocked 'gb' axis kept), and its position or -1."""
    axes = []
    gb_x = -1
    for kind, gid in plan.x_axes:
        if kind == "g":
            if gid == plan.gb_gid:
                gb_x = len(axes)
                axes.append(("gb", gid))
            continue
        axes.append((kind, gid))
    return axes, gb_x


def _gk_body(plan, xrv, xiv, wr, wi, put, precision=None):
    """One (K, bf, fm) sub-problem; ``put(h_sel, fi, re, im)`` stores."""
    import jax.numpy as jnp
    from jax import lax

    K, H = plan.K, plan.H
    bf = plan.block // plan.fm
    has_h = any(a[0] == "H" for a in plan.y_axes)
    if plan.use_mxu:
        # one re/im-packed dot per lane column:
        #   W4 (2H, 2K) = [[wr, -wi], [wi, wr]],  Xc (2K, fm) = [xr; xi]
        #   W4 @ Xc = [re; im]
        dotf = partial(lax.dot_general,
                       dimension_numbers=(((1,), (0,)), ((), ())),
                       precision=precision or lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        w4 = jnp.concatenate(
            [jnp.concatenate([wr, -wi], axis=1),
             jnp.concatenate([wi, wr], axis=1)], axis=0)
        xc = jnp.concatenate([xrv, xiv], axis=0)    # (2K, bf, fm)
        for fi in range(bf):
            o = dotf(w4, xc[:, fi])                 # (2H, fm)
            re, im = o[:H], o[H:]
            if not has_h:                           # H == 1: no H out axis
                re, im = re[0], im[0]
            put(slice(None), fi, re, im)
        return
    for h in range(H):
        re = im = None
        for k in range(K):
            r = wr[h, k] * xrv[k] - wi[h, k] * xiv[k]
            i = wi[h, k] * xrv[k] + wr[h, k] * xiv[k]
            re = r if re is None else re + r
            im = i if im is None else im + i
        put(h, slice(None), re, im)


def _store_idx(plan, q, h_sel, fi, lead=()):
    """Output-ref index for one put: ``lead`` prefixes (e.g. the batched
    qb axis); the blocked grid axis (if any) receives ``q``."""
    idx = list(lead)
    for a in plan.y_axes:
        if a[0] == "g":
            if a[1] == plan.gb_gid:
                idx.append(q)
            continue
        if a[0] == "H":
            idx.append(h_sel)
        elif a == ("f", 0):
            idx.append(fi)
        else:
            idx.append(slice(None))
    return tuple(idx)


def _gk_kernel(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref, *, plan,
               precision=None):
    K = plan.K
    fm = plan.fm
    bf = plan.block // fm
    axes, gb_x = _block_axes(plan)
    wr = wr_ref[...]
    wi = wi_ref[...]
    xr = xr_ref[...]
    xi = xi_ref[...]
    for q in range(plan.gt):
        if gb_x >= 0:
            sel = tuple(q if k == gb_x else slice(None)
                        for k in range(len(axes)))
            # collapsing the remaining leading axes is layout-preserving
            xrv = xr[sel].reshape(K, bf, fm)
            xiv = xi[sel].reshape(K, bf, fm)
        else:
            xrv = xr.reshape(K, bf, fm)
            xiv = xi.reshape(K, bf, fm)

        def put(h_sel, fi, re, im, q=q):
            or_ref[_store_idx(plan, q, h_sel, fi)] = re
            oi_ref[_store_idx(plan, q, h_sel, fi)] = im

        _gk_body(plan, xrv, xiv, wr, wi, put, precision)


def _gk_specs(plan, batch=0, qb=1):
    """(grid, xspec, yspec) for the (optionally batched) kernel.  ``batch``
    is the vmap width (0 = unbatched); ``qb`` instances share one program."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bf = plan.block // plan.fm
    F_units = next(plan.view_x[k] for k, a in enumerate(plan.x_axes)
                   if a == ("f", 0))
    grid = tuple(plan.view_x[k] // (plan.gt if a[1] == plan.gb_gid else 1)
                 for k, a in enumerate(plan.x_axes)
                 if a[0] == "g") + (F_units // bf,)
    g_pos = {}
    gi = 0
    for kind, gid in plan.x_axes:
        if kind == "g":
            g_pos[gid] = gi
            gi += 1
    nb = 1 if batch else 0   # leading batch axes in specs/grids

    xblock = []
    for k, (kind, gid) in enumerate(plan.x_axes):
        if kind == "c":
            xblock.append(plan.view_x[k])
        elif kind == "g":
            xblock.append(plan.gt if gid == plan.gb_gid else None)
        elif (kind, gid) == ("f", 0):
            xblock.append(bf)
        else:
            xblock.append(plan.fm)

    def x_index(*gids):
        out = []
        for kind, gid in plan.x_axes:
            if kind == "c":
                out.append(0)
            elif kind == "g":
                out.append(gids[nb + g_pos[gid]])
            elif gid == 0:   # ('f', 0)
                out.append(gids[-1])
            else:            # ('f', 1)
                out.append(0)
        return (gids[:nb]) + tuple(out) if nb else tuple(out)

    yblock = []
    for a in plan.y_axes:
        if a[0] == "g":
            yblock.append(plan.gt if a[1] == plan.gb_gid else None)
        elif a[0] == "H":
            yblock.append(plan.H)
        elif a == ("f", 0):
            yblock.append(bf)
        else:
            yblock.append(plan.fm)

    def y_index(*gids):
        out = []
        for a in plan.y_axes:
            if a[0] == "g":
                out.append(gids[nb + g_pos[a[1]]])
            elif a[0] == "H":
                out.append(0)
            elif a == ("f", 0):
                out.append(gids[-1])
            else:
                out.append(0)
        return (gids[:nb]) + tuple(out) if nb else tuple(out)

    if batch:
        grid = (batch // qb,) + grid
        xblock = [qb] + xblock
        yblock = [qb] + yblock
    xspec = pl.BlockSpec(tuple(xblock), x_index, memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec(tuple(yblock), y_index, memory_space=pltpu.VMEM)
    return grid, xspec, yspec


def _gk_unbatched(plan, interpret, xr_flat, xi_flat, wr_flat, wi_flat,
                  precision=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wr = _build_wk(wr_flat, plan)
    wi = _build_wk(wi_flat, plan)
    xr = xr_flat.reshape(plan.view_x)
    xi = xi_flat.reshape(plan.view_x)
    grid, xspec, yspec = _gk_specs(plan)
    wspec = pl.BlockSpec((plan.H, plan.K), lambda *g: (0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(plan.view_y, jnp.float32)
    traffic = 4 * 2 * (_prod(plan.view_x) + _prod(plan.view_y)
                       + plan.K * plan.H)
    return pl.pallas_call(
        partial(_gk_kernel, plan=plan, precision=precision),
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


def _gk_kernel_bd(xr_ref, xi_ref, bd_ref, or_ref, oi_ref, *, plan, qb,
                  precision=None):
    """Batched kernel: qb slice instances block-diagonally packed into one
    (qb*2H, qb*2K) @ (qb*2K, fm) dot per lane column — full MXU width at
    any K.  The instance axis collapses into the contract rows for FREE
    (leading-dim reshape; the tiled (bf, fm) minor dims are untouched)."""
    import jax.numpy as jnp
    from jax import lax

    K, H = plan.K, plan.H
    fm = plan.fm
    bf = plan.block // fm
    axes, gb_x = _block_axes(plan)
    w = bd_ref[...]
    if w.ndim == 3:
        w = w[0]
    dotf = partial(lax.dot_general,
                   dimension_numbers=(((1,), (0,)), ((), ())),
                   precision=precision or lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    has_h = any(a[0] == "H" for a in plan.y_axes)
    xr_all = xr_ref[...]
    xi_all = xi_ref[...]
    for q in range(plan.gt):
        if gb_x >= 0:
            sel = (slice(None),) + tuple(
                q if k == gb_x else slice(None) for k in range(len(axes)))
            xr = xr_all[sel].reshape(qb, K, bf, fm)
            xi = xi_all[sel].reshape(qb, K, bf, fm)
        else:
            xr = xr_all.reshape(qb, K, bf, fm)
            xi = xi_all.reshape(qb, K, bf, fm)
        xc = jnp.concatenate([xr, xi], axis=1).reshape(qb * 2 * K, bf, fm)
        for fi in range(bf):
            o = dotf(w, xc[:, fi])                     # (qb*2H, fm)
            o3 = o.reshape(qb, 2, H, fm)
            re, im = o3[:, 0], o3[:, 1]                # (qb, H, fm)
            if not has_h:
                re, im = re[:, 0], im[:, 0]            # (qb, fm)
            or_ref[_store_idx(plan, q, slice(None), fi,
                              lead=(slice(None),))] = re
            oi_ref[_store_idx(plan, q, slice(None), fi,
                              lead=(slice(None),))] = im


def _gk_batched(plan, interpret, W, qb, xr_b, xi_b, w4_b, precision=None):
    """Batched pallas call; ``w4_b`` is (W//qb, qb*2H, qb*2K) or the single
    shared (qb*2H, qb*2K) block-diagonal matrix."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import jax.numpy as jnp

    xr = xr_b.reshape((W,) + plan.view_x)
    xi = xi_b.reshape((W,) + plan.view_x)
    grid, xspec, yspec = _gk_specs(plan, batch=W, qb=qb)
    if w4_b.ndim == 3:
        wspec = pl.BlockSpec((1,) + w4_b.shape[1:],
                             lambda *g: (g[0],) + (0,) * 2,
                             memory_space=pltpu.VMEM)
    else:
        wspec = pl.BlockSpec(w4_b.shape, lambda *g: (0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((W,) + plan.view_y, jnp.float32)
    traffic = 4 * 2 * W * (_prod(plan.view_x) + _prod(plan.view_y))
    return pl.pallas_call(
        partial(_gk_kernel_bd, plan=plan, qb=qb, precision=precision),
        grid=grid,
        in_specs=[xspec, xspec, wspec],
        out_specs=(yspec, yspec),
        out_shape=(out_shape, out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=plan.flops * W, bytes_accessed=traffic, transcendentals=0),
        interpret=interpret,
    )(xr, xi, w4_b)


def _w4_of(wr, wi):
    import jax.numpy as jnp

    return jnp.concatenate(
        [jnp.concatenate([wr, -wi], axis=-1),
         jnp.concatenate([wi, wr], axis=-1)], axis=-2)


def apply_gk_step(field, x, y, plan, interpret=None):
    """Execute one gather-K step on SplitField pairs (traceable).

    Under jax.vmap (the executor's slice batching) a custom batching rule
    packs ``plan.qb`` slice instances block-diagonally into each MXU dot
    (see _gk_kernel_bd) instead of letting vmap multiply the grid — the
    naive vmap path measured overhead-bound (~0.9us per grid program)."""
    import jax
    import jax.numpy as jnp

    from .lowering import physical_shape

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xv, wv = (x, y) if plan.w_is_j else (y, x)
    if plan.pre is not None:
        from .lowering import apply_reorder
        xv = apply_reorder(field, xv, plan.pre)
    from .lanes import kernel_precision
    precision = kernel_precision(field)

    @jax.custom_batching.custom_vmap
    def gk(xr_flat, xi_flat, wr_flat, wi_flat):
        return _gk_unbatched(plan, interpret, xr_flat, xi_flat,
                             wr_flat, wi_flat, precision)

    @gk.def_vmap
    def gk_vmap(axis_size, in_batched, xr_flat, xi_flat, wr_flat, wi_flat):
        W = axis_size
        qb = min(plan.qb, W & (-W))
        xb = in_batched[0]
        wb = in_batched[2]
        # qb == 1 (K >= 64) still goes through the batched call: it keeps
        # the batch a leading GRID axis with per-instance windows, where
        # the naive-vmap fallback folds the whole batch into the VMEM
        # window (measured: 161MB scoped VMEM compile abort on the sc25
        # plan at width 8 — f32[8,2,32,4,256,128] output windows)
        if plan.use_mxu:
            if not xb:
                xr = jnp.broadcast_to(xr_flat[None], (W,) + xr_flat.shape)
                xi = jnp.broadcast_to(xi_flat[None], (W,) + xi_flat.shape)
            else:
                xr, xi = xr_flat, xi_flat
            H2, K2 = 2 * plan.H, 2 * plan.K
            if wb:
                idx = jnp.asarray(plan.wk_idx)
                w4 = _w4_of(
                    jnp.take(wr_flat.reshape(W, -1), idx, axis=1),
                    jnp.take(wi_flat.reshape(W, -1), idx, axis=1))
                g = w4.reshape(W // qb, qb, H2, K2)
                bd = jnp.zeros((W // qb, qb * H2, qb * K2), jnp.float32)
                for q in range(qb):
                    bd = bd.at[:, q * H2:(q + 1) * H2,
                               q * K2:(q + 1) * K2].set(g[:, q])
            else:
                w4 = _w4_of(_build_wk(wr_flat, plan),
                            _build_wk(wi_flat, plan))
                bd = jnp.zeros((qb * H2, qb * K2), jnp.float32)
                for q in range(qb):
                    bd = bd.at[q * H2:(q + 1) * H2,
                               q * K2:(q + 1) * K2].set(w4)
            yr, yi = _gk_batched(plan, interpret, W, qb,
                                 xr.reshape(W, -1), xi.reshape(W, -1), bd,
                                 precision)
            return (yr, yi), (True, True)
        # non-MXU (VPU-path) plans: naive pallas vmap folds the whole
        # batch into the VMEM window (measured: 161MB scoped VMEM
        # compile abort on the sc25 plan at width 8) — run the batch as
        # a sequential lax.map instead, keeping per-instance windows.
        # Unbatched operands are broadcast (W is small; an unbatched X
        # is the rare slice-invariant case).
        args = (xr_flat, xi_flat, wr_flat, wi_flat)
        stacked = tuple(
            a if b else jnp.broadcast_to(a[None], (W,) + a.shape)
            for a, b in zip(args, in_batched))
        out = jax.lax.map(
            lambda t: _gk_unbatched(plan, interpret, *t,
                                    precision=precision), stacked)
        return out, (True, True)

    yr, yi = gk(xv[0].reshape(-1), xv[1].reshape(-1),
                wv[0].reshape(-1), wv[1].reshape(-1))
    return field.reshape((yr, yi), physical_shape(plan.dims_y))
