"""Lower label-einsum steps onto multi-dim dot_generals over flat storage.

TPU HBM layouts tile the two trailing axes to (sublane, lane) = (8, 128).
High-rank ``[2]*n`` buffers are catastrophically padded; failure modes
measured on this stack:

  * a single rank-20 einsum on [2]*20 operands never finishes compiling;
  * explicit device transposes of 2^26+ buffers plan 64GB padded copies
    whenever XLA's layout propagation lands small dims minor;
  * 2-D views with a small minor dim (e.g. (2^27, 2)) pad 64x even as
    reshapes;
  * but ONE lax.dot_general with multi-dim batch/contract dimension_numbers
    over run-collapsed operands compiles in seconds and lets the MXU path
    handle the interleaving internally;
  * and 1-D element gathers with in-trace iota-computed indices always
    compile (no index constants — a 2^26 baked index array overflows the
    remote-compile request size).

Design:
  * Intermediates live FLAT: physical shape (first_logical_dim, rest).
  * Operands are NEVER reordered: each step reshapes them to class-grouped
    dims (adjacent same-class axes merged; batch/contract groupings refined
    to agree across operands) and issues one multi-dim dot_general.
  * The produced label order (batch + lhs-free + rhs-free) becomes the
    node's output order wherever the scheme allows — so most steps have no
    data movement beyond the dot itself.  Forced output reorders (sparse
    cross-regime batch merges) run as small transposes or, when big, 1-D
    element gathers.
"""

from dataclasses import dataclass
from functools import reduce
from operator import mul

# above this element count, explicit device transposes are banned
TRANSPOSE_MAX_ELEMS = 1 << 24


def _prod(xs):
    return reduce(mul, xs, 1)


def physical_shape(dims):
    """Storage shape for logical dims: () / (d,) / (d0, prod(rest))."""
    dims = tuple(dims)
    if len(dims) <= 1:
        return dims
    return (dims[0], _prod(dims[1:]))


def fused_phys(dims):
    """Fused-field storage shape: the implicit trailing c axis (dim 2) is
    folded into the flat minor dim (c varies fastest)."""
    p = physical_shape(dims)
    if not p:
        return (2,)
    return p[:-1] + (p[-1] * 2,)


def collapse_runs(dims, perm):
    """Collapse consecutive-axis runs of a transpose: reshape to one dim per
    run, permute runs.  (3,4,5,0,1,2) on [2]*6 becomes a rank-2 (8,8) swap."""
    runs = []
    for p in perm:
        if runs and p == runs[-1][-1] + 1:
            runs[-1].append(p)
        else:
            runs.append([p])
    src = sorted(runs, key=lambda r: r[0])
    index = {tuple(r): k for k, r in enumerate(src)}
    gdims = tuple(_prod(dims[a] for a in r) for r in src)
    gperm = tuple(index[tuple(r)] for r in runs)
    return gdims, gperm


# -- output reorders ------------------------------------------------------

@dataclass(frozen=True)
class Reorder:
    """One axis-permutation of a flat-stored tensor."""

    mode: str            # 'transpose' | 'gather'
    dims: tuple          # run-collapsed logical dims (source order)
    perm: tuple          # run-collapsed permutation
    final_shape: tuple   # reshape after the permutation


def plan_reorder(label_dims, perm_labels, final_shape):
    dims, perm = collapse_runs(tuple(label_dims), tuple(perm_labels))
    mode = "transpose" if _prod(dims) <= TRANSPOSE_MAX_ELEMS else "gather"
    if mode == "gather" and perm[-1] != len(dims) - 1 \
            and _prod(dims) >= (1 << 31):
        # element-gather indices are int32; a moving minor run on a >=2^31
        # buffer can only run as a (padded) transpose
        mode = "transpose"
    return Reorder(mode, dims, perm, tuple(final_shape))


def _element_indices(dims, perm):
    """Element-permutation indices computed in-trace from iota (no host
    constants; ~2 integer VPU ops per collapsed axis)."""
    import jax.numpy as jnp

    n = len(dims)
    in_strides = [1] * n
    for a in range(n - 2, -1, -1):
        in_strides[a] = in_strides[a + 1] * dims[a + 1]
    out_sizes = [dims[p] for p in perm]
    total = _prod(dims)
    iota = jnp.arange(total, dtype=jnp.int32)
    idx = jnp.zeros_like(iota)
    stride_out = total
    for t in range(n):
        stride_out //= out_sizes[t]
        digit = (iota // stride_out) % out_sizes[t]
        idx = idx + digit * in_strides[perm[t]]
    return idx


def apply_reorder(field, x, r):
    if r.mode == "transpose":
        return field.regroup(x, r.dims, r.perm, r.final_shape)
    if r.perm[-1] == len(r.dims) - 1 and len(r.dims) > 1:
        # stationary minor run: gather whole rows — also the only valid
        # form for >=2^31-element buffers (element indices are int32)
        rows = _prod(r.dims[:-1])
        assert rows < (1 << 31), "row count must fit int32"
        idx = _element_indices(r.dims[:-1], r.perm[:-1])
        view = field.reshape(x, (rows, r.dims[-1]))
        return field.reshape(field.take(view, idx, axis=0), r.final_shape)
    assert _prod(r.dims) < (1 << 31), \
        "element gather requires <2^31 elements; re-plan with a transpose"
    idx = _element_indices(r.dims, r.perm)
    flat = field.reshape(x, (idx.shape[0],))
    return field.reshape(field.take(flat, idx, axis=0), r.final_shape)


# -- step lowering --------------------------------------------------------

@dataclass(frozen=True)
class FusedPlan:
    """Single-dot complex contraction (fused-field mode).

    The complex product is executed as ONE real dot_general by treating the
    re/im axis as a dim-2 tensor axis: the smaller operand W is expanded at
    trace time into W4[..., p, c] = R[c, p, q] . W[..., q] (R = the real
    2x2x2 representation of complex multiplication), and the dot contracts
    p together with the bond dims.  The data operand is read ONCE from HBM
    (the 4-dot split chain reads it twice), which is the binding resource
    on the memory-bound contraction steps; measured 1.5-1.9x per hot step.
    The c axis is the trailing axis of every tensor (folded into the flat
    minor dim), so no per-tensor layout metadata is needed.
    """

    w_is_j: bool         # operand j is the (smaller) W4-expanded side
    w4_lhs: bool         # W4 passed as dot lhs (else data operand is lhs)
    n_w: int             # rank of the W operand (for the expansion einsum)
    dims_w: tuple        # logical dims of W (c-free)
    shape_d: tuple       # grouped reshape for the stacked data operand
    shape_w: tuple       # grouped reshape for W4
    dnums: tuple
    re_out: Reorder | None
    phys_y: tuple        # flat folded physical output shape


@dataclass(frozen=True)
class Lowered:
    swapped: bool        # operands passed to the dot as (y, x)
    shape_l: tuple       # class-grouped reshape dims for the lhs operand
    shape_r: tuple
    dnums: tuple         # lax.dot_general dimension_numbers (multi-dim)
    re_out: Reorder | None  # output reorder to iy order (None if natural)
    dims_y: tuple        # logical output dims (iy order)
    phys_y: tuple        # physical output shape
    fused: FusedPlan | None = None  # single-dot plan for fused-field mode


def preferred_output_order(ix_i, ix_j, iy_set, dims_i=None, dims_j=None):
    """Transpose-free output label order: batch + bigger-free + smaller-free.

    With dims given, the larger operand's free labels come first — that is
    the natural order of BOTH the split dot (which may swap operands) and
    the fused single-dot (large operand as lhs, re/im axis trailing)."""
    set_i, set_j = set(ix_i), set(ix_j)
    if dims_i is not None and _prod(dims_j) > _prod(dims_i):
        ix_i, ix_j = ix_j, ix_i
        set_i, set_j = set_j, set_i
    batch = [l for l in ix_i if l in iy_set and l in set_j]
    free_i = [l for l in ix_i if l in iy_set and l not in set_j]
    free_j = [l for l in ix_j if l in iy_set and l not in set_i]
    return tuple(batch + free_i + free_j)


def _grouping(ix, classes, mergeable):
    """Group adjacent same-class axes of one operand; batch/contract groups
    merge only when both operands agree (``mergeable``)."""
    groups = []
    for lab in ix:
        cls = classes[lab]
        if (groups and groups[-1][0] == cls
                and (cls == "free" or mergeable(groups[-1][1][-1], lab))):
            groups[-1][1].append(lab)
        else:
            groups.append((cls, [lab]))
    return groups


def _build(ix_l, ix_r, dims_l, dims_r, classes):
    dim_of = {}
    for lab, d in zip(ix_l, dims_l):
        dim_of[lab] = d
    for lab, d in zip(ix_r, dims_r):
        dim_of[lab] = d
    pos_l = {lab: k for k, lab in enumerate(ix_l)}
    pos_r = {lab: k for k, lab in enumerate(ix_r)}

    def mergeable(a, b):
        return (pos_l.get(b, -9) == pos_l.get(a, -7) + 1
                and pos_r.get(b, -9) == pos_r.get(a, -7) + 1)

    groups_l = _grouping(ix_l, classes, mergeable)
    groups_r = _grouping(ix_r, classes, mergeable)
    shape_l = tuple(_prod(dim_of[x] for x in labs) for _, labs in groups_l)
    shape_r = tuple(_prod(dim_of[x] for x in labs) for _, labs in groups_r)
    key_l = {tuple(labs): k for k, (cls, labs) in enumerate(groups_l)}
    key_r = {tuple(labs): k for k, (cls, labs) in enumerate(groups_r)}
    batch_groups = [labs for cls, labs in groups_l if cls == "batch"]
    contract_groups = [labs for cls, labs in groups_l if cls == "contract"]
    for labs in batch_groups + contract_groups:
        assert tuple(labs) in key_r, "operand groupings must agree"
    bx = tuple(key_l[tuple(g)] for g in batch_groups)
    by = tuple(key_r[tuple(g)] for g in batch_groups)
    cx = tuple(key_l[tuple(g)] for g in contract_groups)
    cy = tuple(key_r[tuple(g)] for g in contract_groups)
    dnums = ((cx, cy), (bx, by))
    produced = [x for g in batch_groups for x in g]
    produced += [x for cls, labs in groups_l if cls == "free" for x in labs]
    produced += [x for cls, labs in groups_r if cls == "free" for x in labs]
    return shape_l, shape_r, dnums, produced, dim_of


_P, _C = "#p", "#c"


# W4 expansion quadruples the W operand; under a wide slice-vmap the temps
# multiply by the vmap width, so large-W steps fall back to the split path
# (contract_step unstacks on the fly).  2^15 elements keeps the W4 temp
# per step under ~64MB at vmap width 128.
FUSED_W_MAX_ELEMS = 1 << 15


def _lower_fused(ix_i, ix_j, iy, dims_i, dims_j):
    """Plan the single-dot fused-complex execution of one step (or None)."""
    if min(_prod(dims_i), _prod(dims_j)) > FUSED_W_MAX_ELEMS:
        return None
    iy2 = tuple(iy) + (_C,)
    set_i, set_j, set_y = set(ix_i), set(ix_j), set(iy2)
    classes = {}
    for lab in set_i | set_j:
        if lab in set_y:
            classes[lab] = "batch" if (lab in set_i and lab in set_j) else "free"
        else:
            classes[lab] = "contract"
    classes[_P] = "contract"
    classes[_C] = "free"

    best = None
    # search both W-side choices (where admissible) x both dot orientations;
    # a zero-reorder produced order wins
    for w_is_j in (True, False):
        dims_w = dims_j if w_is_j else dims_i
        if _prod(dims_w) > FUSED_W_MAX_ELEMS:
            continue
        ix_d = tuple(ix_i if w_is_j else ix_j) + (_P,)
        dims_d = tuple(dims_i if w_is_j else dims_j) + (2,)
        ix_w4 = tuple(ix_j if w_is_j else ix_i) + (_P, _C)
        dims_w4 = tuple(dims_w) + (2, 2)
        for w4_lhs in (False, True):
            ix_l, ix_r = (ix_w4, ix_d) if w4_lhs else (ix_d, ix_w4)
            dims_l, dims_r = (dims_w4, dims_d) if w4_lhs else (dims_d, dims_w4)
            shape_l, shape_r, dnums, produced, dim_of = _build(
                ix_l, ix_r, dims_l, dims_r, classes)
            dims_y = tuple(dim_of[lab] for lab in iy2)
            phys_y = physical_shape(dims_y[:-1])
            phys_y = (phys_y[:-1] + (phys_y[-1] * 2,)) if phys_y else (2,)
            if tuple(produced) == iy2:
                re_out, cost = None, 0
            else:
                prod_pos = {lab: k for k, lab in enumerate(produced)}
                re_out = plan_reorder(
                    tuple(dim_of[lab] for lab in produced),
                    tuple(prod_pos[lab] for lab in iy2), phys_y)
                # a transpose whose collapsed minor dim is tiny materializes
                # a 128-lane-padded buffer (32-64x HBM): use the flat gather,
                # which only ever touches well-shaped 1-D views
                if (re_out.mode == "transpose"
                        and re_out.dims[re_out.perm[-1]] < 64):
                    re_out = Reorder("gather", re_out.dims, re_out.perm,
                                     re_out.final_shape)
                cost = ((1 if re_out.mode == "transpose" else 8)
                        * _prod(re_out.dims))
            # grouped shapes stored by ROLE (data vs W4), not by dot side
            cand = FusedPlan(w_is_j, w4_lhs, len(ix_w4) - 2, tuple(dims_w),
                             shape_r if w4_lhs else shape_l,
                             shape_l if w4_lhs else shape_r,
                             dnums, re_out, phys_y)
            if best is None or cost < best[0]:
                best = (cost, cand)
            if cost == 0:
                return best[1]
    return best[1]


def lower_step(ix_i, ix_j, iy, dims_i, dims_j):
    """Precompute the dot_general lowering of one step (host side).

    Tries both operand orientations; prefers one needing no output reorder,
    else the one with the cheapest reorder.  Also attaches the fused-field
    single-dot plan (see FusedPlan).
    """
    iy = tuple(iy)
    set_i, set_j, set_y = set(ix_i), set(ix_j), set(iy)
    classes = {}
    for lab in {*ix_i, *ix_j}:
        if lab in set_y:
            classes[lab] = "batch" if (lab in set_i and lab in set_j) else "free"
        else:
            classes[lab] = "contract"

    best = None
    for swapped in (False, True):
        ix_l, ix_r = (ix_j, ix_i) if swapped else (ix_i, ix_j)
        dims_l, dims_r = (dims_j, dims_i) if swapped else (dims_i, dims_j)
        shape_l, shape_r, dnums, produced, dim_of = _build(
            ix_l, ix_r, dims_l, dims_r, classes)
        dims_y = tuple(dim_of[lab] for lab in iy)
        phys_y = physical_shape(dims_y)
        if tuple(produced) == iy:
            re_out, cost = None, 0
        else:
            prod_pos = {lab: k for k, lab in enumerate(produced)}
            re_out = plan_reorder(
                tuple(dim_of[lab] for lab in produced),
                tuple(prod_pos[lab] for lab in iy), phys_y)
            cost = (1 if re_out.mode == "transpose" else 8) * _prod(re_out.dims)
        cand = Lowered(swapped, shape_l, shape_r, dnums, re_out,
                       dims_y, phys_y)
        if best is None or cost < best[0]:
            best = (cost, cand)
        if cost == 0:
            break
    fused = _lower_fused(ix_i, ix_j, iy, dims_i, dims_j)
    return Lowered(best[1].swapped, best[1].shape_l, best[1].shape_r,
                   best[1].dnums, best[1].re_out, best[1].dims_y,
                   best[1].phys_y, fused)


def apply_lowered(field, x, y, low):
    """Execute one lowered step on physical (flat) field tensors."""
    if getattr(field, "mode", None) == "fused":
        return field.contract_step(x, y, low)
    l, r = (y, x) if low.swapped else (x, y)
    lg = field.reshape(l, low.shape_l)
    rg = field.reshape(r, low.shape_r)
    out = field.dot(lg, rg, low.dnums)
    if low.re_out is not None:
        return apply_reorder(field, out, low.re_out)
    return field.reshape(out, low.phys_y)
