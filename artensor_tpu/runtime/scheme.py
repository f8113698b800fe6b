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


def contraction_scheme(ctree, lane_schedule=True, negotiate=True,
                       fuse=True):
    """Dense (full-amplitude) scheme.

    Returns ``(steps, output_bonds)``: the steps list and the bond labels of
    the final result tensor (open legs), in the axis order the executor will
    produce.

    With ``lane_schedule`` (default), output leg orders follow the
    TIME-ORDERED layout discipline (legs sorted by the step at which they
    are contracted; see contraction_scheme_sparse) so every step sees its
    contract legs leading, and eligible steps get a Pallas plan attached:
    gather-K (runtime/gatherk.py) first, then the v1 lane kernel, then the
    both-big pair kernel, then the pre-permuted gather-K form — whose
    explicit transposes producer-order negotiation (runtime/negotiate.py)
    then tries to remove, exactly as in the sparse compiler.

    ``fuse``: reassociate small-operand chains (runtime/fuse.py) so the
    big carrier is swept once per combined gate block; each rewrite is
    arbitrated by the compiled scheme's wall estimate.
    """
    if not lane_schedule or not negotiate \
            or len(ctree.tn.tensor_bonds) > 300:
        steps, ob, _ = _compile_dense(ctree, lane_schedule, None)
        return steps, ob
    from .negotiate import negotiate as _negotiate

    if fuse:
        from ..planner.tree import ContractionTree
        from .fuse import reassociate_small_chains
        from .metrics import scheme_wall_estimate

        tn = ctree.tn

        def est_of(ct):
            s, _ob, _req = _compile_dense(ct, lane_schedule, None)
            return scheme_wall_estimate(s, 0)[0]

        state = {}

        def accept(cand):
            if "est" not in state:      # lazy: no candidates, no compile
                state["est"] = est_of(ctree)
            ct2 = ContractionTree(tn, cand)
            e = est_of(ct2)
            if e < state["est"]:
                state["est"] = e
                return True
            return False

        fused = reassociate_small_chains(
            ctree.to_order_dfs(), tn.tensor_bonds, tn.bond_dims,
            accept=accept)
        if fused != [tuple(p) for p in ctree.to_order_dfs()]:
            ctree = ContractionTree(tn, fused)

    def compile_fn(overrides):
        steps, ob, req = _compile_dense(ctree, lane_schedule, overrides)
        return (steps, ob), steps, req

    return _negotiate(compile_fn)


def _compile_dense(ctree, lane_schedule, _overrides):
    tn = ctree.tn
    if lane_schedule and len(tn.tensor_bonds) > 300:
        # pod-scale schemes: see contraction_scheme_sparse
        lane_schedule = False
    dims = {b: int(d) for b, d in tn.bond_dims.items()}
    bond_order = {}  # id(node) -> tuple of bond labels of its result axes
    steps = []
    output_bonds = ()
    produced_by = {}   # rep tensor id -> index of the step that wrote it
    fresh_of = {}      # rep tensor id -> legs taken from its SMALL operand
                       # (the producer kernel's H block; layout requests
                       # must keep it contiguous)
    requests = {}      # producer step index -> candidate output orders
    if ctree.root.is_leaf():
        # degenerate single-tensor network (everything simplified away):
        # no steps; the staged tensor IS the result
        return steps, list(tn.tensor_bonds[ctree.root.leaf_id]), requests
    vertices = internal_nodes_in_execution_order(ctree)
    # pre-pass: the step index at which each bond is contracted
    time_of = {}
    for t, v in enumerate(vertices):
        for child in (v.left, v.right):
            if child.is_leaf():
                bond_order.setdefault(
                    id(child), tuple(tn.tensor_bonds[child.leaf_id]))
        all_b = set()
        for child in (v.left, v.right):
            all_b |= (set(tn.tensor_bonds[child.leaf_id])
                      if child.is_leaf() else set(child.boundary.keys()))
        for b in all_b - set(v.boundary.keys()):
            time_of.setdefault(b, t)
    for v in vertices:
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
        if lane_schedule:
            from .gatherk import HK_CAP, MIN_X_ELEMS, plan_gk_step
            from .lanes import plan_lane_step, plan_pair_step
            from .lowering import _prod
            from .sparse import _time_sorted_output

            base = [b for b in ix_i if b in yset]
            base += [b for b in ix_j if b in yset and b not in set(base)]
            size_i, size_j = _prod(dims_i), _prod(dims_j)
            iy = tuple(_time_sorted_output(
                list(ix_i), list(ix_j), base, time_of, size_i >= size_j,
                full_sort=(max(size_i, size_j) < MIN_X_ELEMS
                           or min(size_i, size_j) > HK_CAP)))
        else:
            iy = preferred_output_order(ix_i, ix_j, yset)
        t = len(steps)
        overridden = (_overrides is not None and t in _overrides
                      and set(_overrides[t]) == yset)
        if overridden:
            iy = tuple(_overrides[t])
        assert set(iy) == yset
        step = make_dense_step(i, j, ix_i, ix_j, iy, dims_i, dims_j, lane)
        if lane_schedule and lane is None:
            lane = plan_gk_step(step.ix_i, step.ix_j, step.iy,
                                step.dims_i, step.dims_j)
            if lane is None:
                lane = plan_lane_step(step.ix_i, step.ix_j, step.iy,
                                      step.dims_i, step.dims_j)
            if lane is None:
                lane = plan_pair_step(step.ix_i, step.ix_j, step.iy,
                                      step.dims_i, step.dims_j)
            if lane is None:
                # no-f-run residuals: one cheap run-collapsed transpose of
                # X into a GK-friendly order (iy unchanged, so no
                # downstream layout effects); est-gated against the XLA
                # fallback inside the planner (see contraction_scheme_
                # sparse, where this form took kernel coverage 32%->91%)
                from .gatherk import plan_gk_step_pre
                lane = plan_gk_step_pre(step.ix_i, step.ix_j, step.iy,
                                        step.dims_i, step.dims_j)
            if lane is not None:
                import dataclasses
                step = dataclasses.replace(step, lane=lane)
            elif max(size_i, size_j) >= MIN_X_ELEMS and not overridden:
                # dense XLA fallback: a forced reorder on a big dense
                # intermediate is a multi-pass element gather (measured
                # 73 s/block vs 1.4 at n30 2^24 when every step pays it);
                # keep the transpose-free natural order instead.  Small
                # steps keep the time order so the invariant establishes
                # early and downstream kernels stay eligible.  Overridden
                # steps keep the negotiated order (est judges the trial).
                iy = preferred_output_order(ix_i, ix_j, yset,
                                            dims_i, dims_j)
                step = make_dense_step(i, j, ix_i, ix_j, iy,
                                       dims_i, dims_j, None)
            from .gatherk import GKPlan as _GKPlan
            if (isinstance(lane, _GKPlan)
                    and lane.pre is not None and lane.px is not None
                    and (_overrides is None
                         or produced_by.get(i if lane.w_is_j else j)
                         not in _overrides)):
                # ask X's producer to emit a GK-friendly order directly
                from .sparse import _layout_request_candidates
                x_tid = i if lane.w_is_j else j
                ix_x0 = ix_i if lane.w_is_j else ix_j
                ix_w0 = ix_j if lane.w_is_j else ix_i
                rel_x = step.ix_i if lane.w_is_j else step.ix_j
                orig_of_x = dict(zip(rel_x, ix_x0))
                prod = produced_by.get(x_tid)
                if prod is not None and prod not in requests:
                    cands = _layout_request_candidates(
                        tuple(ix_x0), tuple(ix_w0), tuple(iy), dims,
                        fresh_of.get(x_tid, ()),
                        [orig_of_x[l] for l in lane.px])
                    if cands:
                        requests[prod] = cands
        bond_order[id(v)] = iy
        steps.append(step)
        from .lowering import _prod as _prodf
        small_j = _prodf(dims_i) >= _prodf(dims_j)
        sm, bg = (ix_j, ix_i) if small_j else (ix_i, ix_j)
        fresh_of[i] = tuple(b for b in iy
                            if b in set(sm) and b not in set(bg))
        produced_by[i] = t
        if v is ctree.root:
            output_bonds = iy
    if lane_schedule:
        from .lanes import prune_lane_plans

        prune_lane_plans(steps)
    return steps, list(output_bonds), requests
