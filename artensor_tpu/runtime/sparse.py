"""Sparse-state (big-batch) scheme: thousands of bitstring amplitudes in one
contraction.

An amplitude batch axis is threaded through the contraction tree: every
final-qubit tensor starts with a 2-row batch (its output leg's two values),
and each merge combines batch metadata.  Three merge regimes (parity:
/root/reference/artensor/contraction.py:208-341):

  cross    both operands batched, and either every combination is needed or
           the cross product fits the memory budget: einsum with separate
           batch labels, reshape to one batch axis (left-major), optionally
           select the needed rows afterwards.
  aligned  both operands batched, cross product too big: per-target gather
           index arrays pick matching rows from each side and the einsum
           carries ONE shared batch label; the gather+einsum is chunked when
           batch x operand exceeds 2^(sc_target-2).
  pass     at most one operand batched: plain einsum, batch label rides
           along.

Everything the executor needs — index arrays, chunk boundaries, reshapes —
is computed here on the host with numpy, so the executor traces into a
single static XLA program (gathers become jnp.take with constant indices).

Bitstrings are handled as (B, n) uint8 bit matrices rather than python
strings; targets project/unique/sort via numpy (np.unique on rows sorts
lexicographically, matching the reference's sorted-string semantics).
"""

from dataclasses import dataclass
from math import ceil, log2

import numpy as np

from .lowering import lower_step


@dataclass(frozen=True)
class SparseStep:
    i: int
    j: int
    ix_i: tuple          # int einsum labels for buffer i (batch label first if batched)
    ix_j: tuple
    iy: tuple
    gathers: tuple | None    # aligned: ((gi, gj), ...) chunked index arrays
    reshape: tuple | None    # cross: physical (B_total, rest) after batch merge
    post_select: object      # cross: row-index array or None
    lowered: object          # Lowered (non-chunked) or None
    lowered_chunks: tuple | None  # aligned: one Lowered per chunk
    lane: object = None      # LanePlan when the step runs on the Pallas path


def _bits_to_ints(bits):
    """(B, w) uint8 rows -> ints, MSB first. w may be 0 (-> zeros)."""
    if bits.shape[1] == 0:
        return np.zeros(bits.shape[0], dtype=np.int64)
    weights = 1 << np.arange(bits.shape[1] - 1, -1, -1, dtype=np.int64)
    return bits.astype(np.int64) @ weights


def _ints_to_bits(vals, width):
    vals = np.asarray(vals, dtype=np.int64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.int64)
    return ((vals[:, None] >> shifts) & 1).astype(np.uint8)


def _lookup_positions(haystack, needles):
    """Position of each needle in haystack (values unique in haystack)."""
    order = np.argsort(haystack, kind="stable")
    pos = np.searchsorted(haystack[order], needles)
    return order[pos]


def _relabel(*index_lists):
    lab = {}
    for ix in index_lists:
        for b in ix:
            lab.setdefault(b, len(lab))
    return tuple(tuple(lab[b] for b in ix) for ix in index_lists)


def _consumer_contract_map(order, tensor_bonds, final_qubit_tensors=()):
    """Per-step: the contract-leg set of the step that CONSUMES its output.

    Contract sets depend only on bond membership (not on chosen axis
    orders), so this pre-pass is exact for the second, order-choosing pass.
    Steps whose BOTH operands carry amplitude batches (future cross /
    aligned-gather merges) are never lane-schedulable, so their producers
    get an empty hint — paying reorder traffic to deliver them a
    lane-friendly layout buys nothing and feeding scheduler-exotic orders
    into the chunked-gather lowering has measured compile blowups.
    """
    bonds = {t: list(bs) for t, bs in tensor_bonds.items()}
    batched = {t: t in set(final_qubit_tensors) for t in bonds}
    contracted_at = []
    both_batched = []
    for i, j in order:
        common = set(bonds[i]) & set(bonds[j])
        still = {
            b for b in common
            if any(b in bonds[t] for t in bonds if t not in (i, j) and bonds[t])
        }
        contracted = common - still
        new_bonds = [b for b in bonds[i] if b not in contracted]
        new_bonds += [b for b in bonds[j]
                      if b not in contracted and b not in new_bonds]
        bonds[i], bonds[j] = new_bonds, []
        contracted_at.append(contracted)
        both_batched.append(batched[i] and batched[j])
        batched[i] = batched[i] or batched[j]
    consumer = [set() for _ in order]
    consumer_idx = [-1] * len(order)
    producer = {}
    for t, (i, j) in enumerate(order):
        for o in (i, j):
            if o in producer:
                consumer[producer[o]] = (set() if both_batched[t]
                                         else contracted_at[t])
                consumer_idx[producer[o]] = t
        producer[i] = t
    return consumer, consumer_idx


def contraction_scheme_sparse(ctree, bitstrings, sc_target=31,
                              lane_schedule=True, _hints=None):
    """Compile the big-batch scheme.

    Parameters
    ----------
    ctree : planner ContractionTree over the (sliced) sparse network; its
        ``tn.final_qubits`` holds, per qubit, the tensor id carrying that
        qubit's batch axis.
    bitstrings : list[str]
        Target amplitudes as '0'/'1' strings over all final qubits.
    sc_target : float
        log2 memory budget steering cross-vs-aligned and chunking decisions.

    Returns (steps, output_bonds, bitstrings_sorted).
    """
    order = ctree.to_order_dfs()
    # pod-scale schemes keep reference-compatible residual orders: the
    # scheduler's order choices measurably crash this environment's remote
    # XLA compile helper on 400+-step programs (docs/BENCH_NOTES.md), and
    # per-step kernel gains are amortized away by segment-compile latency
    if len(order) > 300:
        lane_schedule = False
    tn = ctree.tn
    dim_of = {b: int(d) for b, d in tn.bond_dims.items()}
    bonds = {t: list(bs) for t, bs in tn.tensor_bonds.items()}
    # tn.final_qubits is qubit-indexed: final_qubits[q] = tensor id of
    # qubit q's batch axis.  Do NOT sort — simplify()'s renumbering need
    # not be monotone in qubit order (contract() re-inserts host tensors
    # at the dict end), and sorting silently permutes the amplitudes.
    final_qubits = list(tn.final_qubits)
    if isinstance(tn.final_qubits, (set, frozenset)):  # legacy callers
        final_qubits = sorted(final_qubits)
    qubit_of_tensor = {tid: q for q, tid in enumerate(final_qubits)}
    n_qubits = len(final_qubits)
    targets = np.array(
        [[int(c) for c in s] for s in bitstrings], dtype=np.uint8)
    assert targets.shape[1] == n_qubits

    # per-tensor batch metadata: (sorted qubit ids, int-encoded partial reps)
    info = {}
    for tid in bonds:
        if tid in qubit_of_tensor:
            info[tid] = ([qubit_of_tensor[tid]], np.array([0, 1], dtype=np.int64))
        else:
            info[tid] = ([], np.array([-1], dtype=np.int64))

    consumer_contract = consumer_idx = None
    if lane_schedule:
        consumer_contract, consumer_idx = _consumer_contract_map(
            order, tn.tensor_bonds, final_qubits)
    steps = []
    last = None
    for t, (i, j) in enumerate(order):
        bond_i, bond_j = bonds[i], bonds[j]
        common = sorted(set(bond_i) & set(bond_j), key=str)
        still_used = {
            b for b in common
            if any(b in bonds[t2] for t2 in bonds if t2 not in (i, j) and bonds[t2])
        }
        contracted = [b for b in common if b not in still_used]
        # Residual output order (reference-compatible) is the base; when
        # lane_schedule is on, EVERY scheduler-eligible step adopts the
        # scheduler's order (schedule_step's lane order when it plans, else
        # fallback_output_order's consumer-aware natural order) — measured
        # end-to-end in round 2 at 1.93s vs 2.19s for residual-only orders.
        # (Round-1 note: adopting the dot's "natural" order with NO
        # consumer awareness was slower, 2.49s vs 2.19s — order choices
        # must be deliberate, which is what the scheduler provides.)
        new_bonds = [b for b in bond_i if b not in contracted]
        new_bonds += [b for b in bond_j if b not in contracted and b not in new_bonds]

        q_i, rep_i = info[i]
        q_j, rep_j = info[j]
        lane = None
        # the lane scheduler covers unbatched steps and pass-steps whose
        # BATCHED side is the bigger operand (batch stays the leading row
        # leg); both-batched (cross/aligned) steps keep their fixed orders
        if lane_schedule and bond_i and bond_j and new_bonds \
                and not (q_i and q_j):
            from .lanes import schedule_step

            BT = "#sched-batch"
            dims_bi0 = [dim_of[b] for b in bond_i]
            dims_bj0 = [dim_of[b] for b in bond_j]
            axi, axj = tuple(bond_i), tuple(bond_j)
            di, dj = tuple(dims_bi0), tuple(dims_bj0)
            yset = set(new_bonds)
            batched = bool(q_i) or bool(q_j)
            if q_i:
                axi = (BT, *axi)
                di = (len(rep_i), *di)
                yset = yset | {BT}
            elif q_j:
                axj = (BT, *axj)
                dj = (len(rep_j), *dj)
                yset = yset | {BT}
            from .lanes import _prod as _lprod

            big_is_i = _lprod(di) >= _lprod(dj)
            batched_is_small = (bool(q_i) and not big_is_i) \
                or (bool(q_j) and big_is_i)
            if not (batched and batched_is_small):
                # batched-big steps pin the batch axis as the leading
                # grid leg (the batch-first convention is load-bearing:
                # gathers, cross reshapes and the final output assume it)
                pin = 1 if (batched and big_is_i == bool(q_i)) else 0
                # deliver consumer-friendly orders only when the consumer
                # actually lane-plans (fixpoint pass below): a reorder
                # that buys nothing downstream is pure extra traffic
                ci = consumer_idx[t]
                cset_t = consumer_contract[t] \
                    if (_hints is None or (0 <= ci and _hints[ci])) else ()
                iy_hint, lane = schedule_step(axi, axj, yset, di, dj,
                                              cset_t, pin=pin)
                if not batched or iy_hint[0] == BT:
                    new_bonds = [b for b in iy_hint if b != BT]
                else:
                    lane = None   # batch would move off the leading axis
        bonds[i], bonds[j] = new_bonds, []
        merged_q = sorted(q_i + q_j)
        gathers = reshape = None
        post_select = None
        batched_i, batched_j = len(q_i) > 0, len(q_j) > 0

        dims_bi = [dim_of[b] for b in bond_i]
        dims_bj = [dim_of[b] for b in bond_j]
        if not batched_i and not batched_j:
            rep = np.array([-1], dtype=np.int64)
            ix_i, ix_j, iy = tuple(bond_i), tuple(bond_j), tuple(new_bonds)
            dims_i, dims_j = tuple(dims_bi), tuple(dims_bj)
        elif batched_i != batched_j:
            rep = rep_i if batched_i else rep_j
            B = "batch"
            ix_i = (B, *bond_i) if batched_i else tuple(bond_i)
            ix_j = (B, *bond_j) if batched_j else tuple(bond_j)
            iy = (B, *new_bonds)
            dims_i = (len(rep_i), *dims_bi) if batched_i else tuple(dims_bi)
            dims_j = (len(rep_j), *dims_bj) if batched_j else tuple(dims_bj)
        else:
            loc_i = [merged_q.index(q) for q in q_i]
            loc_j = [merged_q.index(q) for q in q_j]
            # unique required partial bitstrings over the merged qubits,
            # sorted lexicographically
            sub = np.unique(targets[:, merged_q], axis=0)
            need = _bits_to_ints(sub)
            full_cross = len(need) == 2 ** len(merged_q)
            cheap = len(merged_q) + len(new_bonds) <= sc_target
            if full_cross or cheap:
                # ---- cross regime -------------------------------------
                xb = _ints_to_bits(rep_i, len(q_i))
                yb = _ints_to_bits(rep_j, len(q_j))
                cross = np.zeros(
                    (len(rep_i), len(rep_j), len(merged_q)), dtype=np.uint8)
                cross[:, :, loc_i] = xb[:, None, :]
                cross[:, :, loc_j] = yb[None, :, :]
                rep = _bits_to_ints(cross.reshape(-1, len(merged_q)))
                if len(need) != len(rep):
                    keep = np.sort(_lookup_positions(rep, need))
                    rep = rep[keep]
                    post_select = keep
                BI, BJ = "batch_i", "batch_j"
                ix_i, ix_j = (BI, *bond_i), (BJ, *bond_j)
                iy = (BI, BJ, *new_bonds)
                dims_i = (len(rep_i), *dims_bi)
                dims_j = (len(rep_j), *dims_bj)
                rest = 1
                for b in new_bonds:
                    rest *= dim_of[b]
                # physical 2-D target merging the two batch axes (left-major)
                reshape = ((len(rep_i) * len(rep_j), rest)
                           if new_bonds else (len(rep_i) * len(rep_j),))
            else:
                # ---- aligned-gather regime ----------------------------
                part_i = _bits_to_ints(sub[:, loc_i])
                part_j = _bits_to_ints(sub[:, loc_j])
                gi = _lookup_positions(rep_i, part_i)
                gj = _lookup_positions(rep_j, part_j)
                # sort targets by the larger operand's gather index for
                # memory-friendly (near-sequential) gathers on that side
                major = gi if len(rep_i) >= len(rep_j) else gj
                sort_idx = np.argsort(major, kind="stable")
                gi, gj, rep = gi[sort_idx], gj[sort_idx], need[sort_idx]
                B = len(rep)
                overshoot = log2(B) + max(len(bond_i), len(bond_j)) - (sc_target - 2)
                n_chunks = min(2 ** ceil(max(0.0, overshoot)), B)
                if n_chunks > 1:
                    # ceil-based chunking covers ALL B rows (the reference's
                    # floor-based variant, contraction.py:291-297, drops tail
                    # elements when B % n_chunks > chunk length)
                    L = -(-B // n_chunks)
                    n_chunks = -(-B // L)
                    gathers = tuple(
                        (gi[c * L:(c + 1) * L], gj[c * L:(c + 1) * L])
                        for c in range(n_chunks))
                else:
                    gathers = ((gi, gj),)
                Bl = "batch"
                ix_i, ix_j = (Bl, *bond_i), (Bl, *bond_j)
                iy = (Bl, *new_bonds)
                dims_i = dims_j = None  # chunked: dims vary per chunk

        ix_i, ix_j, iy = _relabel(ix_i, ix_j, iy)
        if gathers is not None:
            lowered = None
            lowered_chunks = tuple(
                lower_step(ix_i, ix_j, iy,
                           (len(gi), *dims_bi), (len(gi), *dims_bj))
                for gi, gj in gathers)
        else:
            lowered = lower_step(ix_i, ix_j, iy, dims_i, dims_j)
            lowered_chunks = None
            if lane is None and lane_schedule:
                # batched pass/cross steps can still be lane-eligible with
                # their fixed (batch-leading) output order
                from .lanes import plan_lane_step

                lane = plan_lane_step(ix_i, ix_j, iy, dims_i, dims_j)
        steps.append(SparseStep(i, j, ix_i, ix_j, iy,
                                gathers, reshape, post_select,
                                lowered, lowered_chunks, lane))
        info[i] = (merged_q, rep)
        last = i

    out_reps = info[last][1]
    bitstrings_sorted = ["".join(map(str, row))
                         for row in _ints_to_bits(out_reps, n_qubits)]
    if lane_schedule:
        from .lanes import prune_lane_plans

        prune_lane_plans(steps)
    if lane_schedule and _hints is None:
        # fixpoint over "which steps lane-plan": recompile with orders
        # adjusted to whether each consumer actually planned
        hints = [s.lane is not None for s in steps]
        for _ in range(3):
            res = contraction_scheme_sparse(ctree, bitstrings, sc_target,
                                            lane_schedule, _hints=hints)
            new_hints = [s.lane is not None for s in res[0]]
            if new_hints == hints:
                return res
            hints = new_hints
        return res
    return steps, bonds[last], bitstrings_sorted


def apply_sparse_step(field, x, y, s):
    """One sparse step on flat-stored field tensors (traceable)."""
    from .lowering import apply_lowered

    if s.gathers is not None:
        parts = [
            apply_lowered(field, field.take(x, gi, axis=0),
                          field.take(y, gj, axis=0), low)
            for (gi, gj), low in zip(s.gathers, s.lowered_chunks)
        ]
        return parts[0] if len(parts) == 1 else field.concat(parts, axis=0)
    if s.lane is not None and getattr(field, "supports_lanes", False):
        from .lanes import PairPlan, apply_lane_step, apply_pair_step

        if isinstance(s.lane, PairPlan):
            out = apply_pair_step(field, x, y, s.lane)
        else:
            out = apply_lane_step(field, x, y, s.lane)
    else:
        out = apply_lowered(field, x, y, s.lowered)
    if s.reshape is not None:
        out = field.reshape(out, s.reshape)
    if s.post_select is not None:
        out = field.take(out, s.post_select, axis=0)
    return out


def execute_sparse(tensors, steps, field):
    """Run a sparse scheme over staged (flat) field tensors (traceable)."""
    bufs = list(tensors)
    last = 0
    for s in steps:
        bufs[s.i] = apply_sparse_step(field, bufs[s.i], bufs[s.j], s)
        bufs[s.j] = None
        last = s.i
    return bufs[last]


def tensor_contraction_sparse(tensors, steps, field=None):
    """Eager convenience wrapper (reference-parity name): numpy in/out."""
    from ..ops.field import make_field

    field = field or make_field()
    staged = [field.wrap(t) for t in tensors]
    return field.unwrap(execute_sparse(staged, steps, field))


def compile_sparse(steps, slicing_axes, num_sliced, output_shape, field):
    """jit-compiled sparse contraction including the 2^k slice scan."""
    import jax

    from .executor import make_sliced_runner

    return jax.jit(make_sliced_runner(
        execute_sparse, steps, slicing_axes, num_sliced, output_shape, field))
