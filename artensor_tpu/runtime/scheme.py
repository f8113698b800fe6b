"""Compile a contraction tree into a static execution scheme.

A scheme is a plain-Python list of step descriptors — fully determined at
compile (host) time, so the executors trace once under ``jax.jit`` with
every shape, axis order, and gather index static.  Each step also carries
its precomputed matmul lowering (runtime/lowering.py): on TPU, tensors are
stored flat and contracted as (B, M, K) x (B, K, N) batched matmuls, never
materializing high-rank ``[2]*n`` buffers.

This mirrors the reference's compile/execute split (/root/reference/
artensor/contraction.py:23-59) while emitting integer labels instead of
capped letter equations.
"""

from dataclasses import dataclass

from .lowering import Lowered, lower_step, preferred_output_order


@dataclass(frozen=True)
class DenseStep:
    i: int
    j: int
    ix_i: tuple
    ix_j: tuple
    iy: tuple
    dims_i: tuple
    dims_j: tuple
    lowered: Lowered
    lane: object = None   # LanePlan when the step runs on the Pallas path


def _relabel(ix_i, ix_j, iy):
    """Map arbitrary bond labels of one step to dense ints."""
    lab = {}
    for b in [*ix_i, *ix_j, *iy]:
        lab.setdefault(b, len(lab))
    return (
        tuple(lab[b] for b in ix_i),
        tuple(lab[b] for b in ix_j),
        tuple(lab[b] for b in iy),
    )


def internal_nodes_in_execution_order(ctree):
    """Internal vertices ordered leaves->root following the DFS convention
    (larger-sc child first) used for buffer-reuse-friendly emission."""
    ctree.mark_representatives()
    out = []
    stack = [ctree.root]
    while stack:
        v = stack.pop()
        if v.is_leaf():
            continue
        out.append(v)
        if v.left.sc > v.right.sc:
            stack += [v.left, v.right]
        else:
            stack += [v.right, v.left]
    out.reverse()
    return out


def make_dense_step(i, j, ix_i, ix_j, iy, dims_i, dims_j, lane=None):
    ix_i2, ix_j2, iy2 = _relabel(ix_i, ix_j, iy)
    low = lower_step(ix_i2, ix_j2, iy2, tuple(dims_i), tuple(dims_j))
    return DenseStep(i, j, ix_i2, ix_j2, iy2,
                     tuple(dims_i), tuple(dims_j), low, lane)


def contraction_scheme(ctree, lane_schedule=True):
    """Dense (full-amplitude) scheme.

    Returns ``(steps, output_bonds)``: the steps list and the bond labels of
    the final result tensor (open legs), in the axis order the executor will
    produce.

    With ``lane_schedule`` (default), each step's output leg order is chosen
    so the *parent* step finds its contract legs lane-resident, and eligible
    steps get a Pallas LanePlan attached (runtime/lanes.py).  Steps whose
    lane plan is infeasible revert to the transpose-free preferred order.
    """
    from .lanes import schedule_step

    tn = ctree.tn
    if lane_schedule and len(tn.tensor_bonds) > 300:
        # pod-scale schemes: see contraction_scheme_sparse
        lane_schedule = False
    dims = {b: int(d) for b, d in tn.bond_dims.items()}
    bond_order = {}  # id(node) -> tuple of bond labels of its result axes
    steps = []
    output_bonds = ()
    if ctree.root.is_leaf():
        # degenerate single-tensor network (everything simplified away):
        # no steps; the staged tensor IS the result
        return steps, list(tn.tensor_bonds[ctree.root.leaf_id])
    parent = {}
    for v in internal_nodes_in_execution_order(ctree):
        parent[id(v.left)] = v
        parent[id(v.right)] = v
    for v in internal_nodes_in_execution_order(ctree):
        for child in (v.left, v.right):
            if child.is_leaf():
                bond_order[id(child)] = tuple(tn.tensor_bonds[child.leaf_id])
        ix_left = bond_order[id(v.left)]
        ix_right = bond_order[id(v.right)]
        if v.rep == v.left.rep:
            i, j = v.left.rep, v.right.rep
            ix_i, ix_j = ix_left, ix_right
        else:
            i, j = v.right.rep, v.left.rep
            ix_i, ix_j = ix_right, ix_left
        yset = set(v.boundary.keys())
        dims_i = [dims[b] for b in ix_i]
        dims_j = [dims[b] for b in ix_j]
        lane = None
        iy = None
        if lane_schedule:
            p = parent.get(id(v))
            if p is not None:
                sib = p.right if p.left is v else p.left
                sib_bonds = (set(tn.tensor_bonds[sib.leaf_id])
                             if sib.is_leaf() else set(sib.boundary.keys()))
                consumer_contract = ((yset | sib_bonds)
                                     - set(p.boundary.keys()))
            else:
                consumer_contract = set()
            iy, lane = schedule_step(ix_i, ix_j, yset, dims_i, dims_j,
                                     consumer_contract)
        if iy is None:
            # output order = the dot_general's natural order: no transposes
            iy = preferred_output_order(ix_i, ix_j, yset)
        assert set(iy) == yset
        bond_order[id(v)] = iy
        steps.append(make_dense_step(i, j, ix_i, ix_j, iy,
                                     dims_i, dims_j, lane))
        if v is ctree.root:
            output_bonds = iy
    if lane_schedule:
        from .lanes import prune_lane_plans

        prune_lane_plans(steps)
    return steps, list(output_bonds)
