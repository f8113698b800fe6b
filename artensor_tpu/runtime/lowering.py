"""Lower label-einsum steps onto flat multi-dim dot_generals (the MXU path).

TPU HBM layouts tile the two trailing axes to (sublane, lane) = (8, 128), so
high-rank ``[2]*n`` buffers are catastrophically padded and the compiler
refuses / OOMs on rank-20+ einsums and on transposes whose minor output dim
is small.  Measured on this stack:

  * rank-20 einsum on [2]*20 operands: never finishes compiling
  * rank-9+ explicit transposes of 2^28 with small minor dims: compiler OOM
    ("Allocation 64GB would exceed memory" — tile padding)
  * the SAME contraction as one dot_general with multiple batch/contracting
    dims of size 2-16 on run-collapsed operands: compiles in seconds — XLA
    owns the layout choice end-to-end and never materializes a padded
    high-rank buffer.

Therefore: intermediates live FLAT (physical shape ``(first_logical_dim,
rest)``), each step reshapes its operands to *class-grouped* dims (adjacent
axes of the same class — batch/contract/free — merged, with batch and
contract groupings refined to agree across both operands) and issues ONE
``lax.dot_general`` with multi-dim dimension_numbers.  No input transposes
exist at all.  The produced label order is ``batch + lhs-free + rhs-free``;
schemes adopt it as the node's output order whenever they can, so output
transposes only remain where semantics force a fixed order (sparse
cross-regime batch merging); those pick the operand orientation that leaves
the largest minor run.
"""

from dataclasses import dataclass
from functools import reduce
from operator import mul


def _prod(xs):
    return reduce(mul, xs, 1)


def physical_shape(dims):
    """Storage shape for logical dims: () / (d,) / (d0, prod(rest))."""
    dims = tuple(dims)
    if len(dims) <= 1:
        return dims
    return (dims[0], _prod(dims[1:]))


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


@dataclass(frozen=True)
class Lowered:
    swapped: bool          # operands passed to the dot as (y, x)
    shape_l: tuple         # grouped reshape dims for the lhs operand
    shape_r: tuple
    dnums: tuple           # lax.dot_general dimension_numbers
    out_label_dims: tuple  # dot output dims at per-label granularity
    out_dims: tuple | None   # run-collapsed transpose dims (if out_perm)
    out_perm: tuple | None   # run-collapsed produced -> iy permutation
    dims_y: tuple          # logical output dims (iy order)
    phys_y: tuple          # physical output shape


def _grouping(ix, classes, mergeable):
    """Group adjacent same-class axes of one operand.

    ``mergeable(a, b)`` gates merging for batch/contract classes (both
    operands must agree); free axes merge whenever adjacent.
    Returns (group_dims_positions, groups) where groups is a list of
    (class, [labels]).
    """
    groups = []
    for k, lab in enumerate(ix):
        cls = classes[lab]
        if (groups and groups[-1][0] == cls
                and (cls == "free" or mergeable(groups[-1][1][-1], lab))):
            groups[-1][1].append(lab)
        else:
            groups.append((cls, [lab]))
    return groups


def _build(ix_l, ix_r, dims_l, dims_r, iy, classes, l_is_i):
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
    # canonical batch/contract group order: appearance in lhs
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
    out_label_dims = tuple(dim_of[x] for x in produced)
    return shape_l, shape_r, dnums, produced, out_label_dims, dim_of


def _minor_run(dims, perm):
    """Size of the run landing on the minor (last) axis after the transpose."""
    if perm is None:
        return float("inf")
    return dims[perm[-1]]


def lower_step(ix_i, ix_j, iy, dims_i, dims_j):
    """Precompute the dot_general lowering of one step (host side).

    ``iy`` fixes the output label order.  Tries both operand orientations
    and keeps the one avoiding an output transpose, or whose transpose has
    the largest minor run (tile-friendliness).
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
        shape_l, shape_r, dnums, produced, out_label_dims, dim_of = _build(
            ix_l, ix_r, dims_l, dims_r, iy, classes, not swapped)
        if tuple(produced) == iy:
            out_dims = out_perm = None
        else:
            prod_pos = {lab: k for k, lab in enumerate(produced)}
            perm = tuple(prod_pos[lab] for lab in iy)
            out_dims, out_perm = collapse_runs(out_label_dims, perm)
        dims_y = tuple(dim_of[lab] for lab in iy)
        cand = Lowered(swapped, shape_l, shape_r, dnums,
                       out_label_dims, out_dims, out_perm,
                       dims_y, physical_shape(dims_y))
        score = _minor_run(out_dims, out_perm)
        if best is None or score > best[0]:
            best = (score, cand)
        if out_perm is None:
            break  # unswapped orientation with no transpose: take it
    return best[1]


def preferred_output_order(ix_i, ix_j, iy_set):
    """The transpose-free output label order for a step (batch + i-free +
    j-free, at label granularity).  Scheme compilers that may choose their
    own output order should use this."""
    set_i, set_j = set(ix_i), set(ix_j)
    batch = [l for l in ix_i if l in iy_set and l in set_j]
    free_i = [l for l in ix_i if l in iy_set and l not in set_j]
    free_j = [l for l in ix_j if l in iy_set and l not in set_i]
    return tuple(batch + free_i + free_j)


def apply_lowered(field, x, y, low):
    """Execute one lowered step on physical (flat) field tensors."""
    l, r = (y, x) if low.swapped else (x, y)
    lg = field.reshape(l, low.shape_l)
    rg = field.reshape(r, low.shape_r)
    out = field.dot(lg, rg, low.dnums)
    if low.out_perm is not None:
        out = field.regroup(out, low.out_dims, low.out_perm, low.phys_y)
    else:
        out = field.reshape(out, low.phys_y)
    return out
