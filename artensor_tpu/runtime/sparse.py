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

# Survivor legs PRESERVE the big operand's order (never re-sorted).  Two
# alternatives were measured and rejected on the sc22 census — full
# re-sort and a minimal-inversion LNDS hoist both LOWERED kernel coverage
# (layout changes cascade non-locally); see docs/BENCH_NOTES.md "Round 3:
# pre-permuted gather-K form for no-f-run residuals" for the data.


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
    note: str = None         # diagnostics: why no kernel plan was attached


def _prod_dims(dim_of, bonds):
    p = 1
    for b in bonds:
        p *= dim_of[b]
    return p


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


def _bond_contract_times(order, tensor_bonds):
    """For each bond, the step index at which it is contracted away.

    Bonds that survive to the output (open legs) are absent.  Membership
    only — independent of any axis-order choices, so this pre-pass is
    exact for the order-choosing main pass.
    """
    bonds = {t: list(bs) for t, bs in tensor_bonds.items()}
    time_of = {}
    for t, (i, j) in enumerate(order):
        common = set(bonds[i]) & set(bonds[j])
        still = {
            b for b in common
            if any(b in bonds[t2] for t2 in bonds
                   if t2 not in (i, j) and bonds[t2])
        }
        for b in common - still:
            time_of[b] = t
        new_bonds = [b for b in bonds[i] if b not in common or b in still]
        new_bonds += [b for b in bonds[j]
                      if (b not in common or b in still)
                      and b not in new_bonds]
        bonds[i], bonds[j] = new_bonds, []
    return time_of


def _time_sorted_output(bond_i, bond_j, new_bonds, time_of, big_is_i,
                        full_sort=False, fresh_first=False):
    """Output order by time-to-contraction (soonest first, open legs last).

    ``full_sort`` (small tensors): sort every leg — cheap transposes that
    ESTABLISH the time-ordered invariant before tensors get big.  Large
    tensors instead PRESERVE the big operand's surviving leg order and
    only insert the small side's fresh bonds as one contiguous block at
    their earliest member's time position (insertion-sort discipline).
    Preserving the order is what keeps the consumer's trailing free run an
    exact contiguous suffix of its X's storage — a full re-sort is not
    idempotent across steps (fresh-block insertions), and any deviation
    breaks the gather-K kernel's f-run match downstream.  The fresh block
    stays contiguous because it is the kernel's H run.
    """
    INF = 1 << 60

    def tkey(b):
        return (time_of.get(b, INF), str(b))

    if full_sort:
        # no fresh-block grouping either: these steps run XLA (too small
        # or too big for gather-K), so H-contiguity buys nothing and a
        # heterogeneous fresh block would plant local inversions that the
        # preserve-order discipline then carries forever
        return sorted(new_bonds, key=tkey)
    xb = bond_i if big_is_i else bond_j
    wb = bond_j if big_is_i else bond_i
    nset = set(new_bonds)
    xset = set(xb)
    fresh = sorted((b for b in wb if b in nset and b not in xset), key=tkey)
    fset = set(fresh)
    others = [b for b in xb if b in nset and b not in fset]
    others += [b for b in new_bonds if b not in fset and b not in set(others)]
    if not fresh:
        return others
    if fresh_first:
        # both-batched (cross) steps: the kernel's H run is (BJ, fresh),
        # so fresh must directly follow the batch axes.  Survivors are
        # FULLY sorted here: a cross chain prepending fresh blocks would
        # otherwise push the next consumer's contract legs deeper each
        # step (measured as the dominant residual no-f-run class), and
        # cross steps never kernel-plan themselves, so breaking their own
        # X-suffix match costs nothing.
        return fresh + sorted(others, key=tkey)
    fkey = min(tkey(b) for b in fresh)
    k = 0
    while k < len(others) and tkey(others[k]) < fkey:
        k += 1
    # never split the trailing minor run: an insertion inside the last
    # ~2^10 elements would break THIS output's own f-run contiguity for
    # its consumer (placing the block early instead is a late-early
    # inversion, which downstream f runs tolerate)
    prod = 1
    kmin = len(others)
    while kmin > 0 and prod < (1 << 10):
        kmin -= 1
        prod *= 2
    k = min(k, kmin)
    return others[:k] + fresh + others[k:]


def contraction_scheme_sparse(ctree, bitstrings, sc_target=31,
                              lane_schedule=True, _hints=None,
                              negotiate=True, lane_max_steps=None,
                              fuse=True):
    # _hints is accepted for backward compatibility and ignored: the
    # round-2 hint fixpoint is superseded by time-ordered layouts (below)
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
    lane_max_steps : int, optional
        Scheme-size cutoff above which kernel scheduling is skipped
        (default ``LANE_SCHEDULE_MAX_STEPS``).  Pod-scale schemes run
        SEGMENTED, where each compiled program is small, so callers on
        that path may raise it to kernel-schedule 400+-step schemes.

    Returns (steps, output_bonds, bitstrings_sorted).

    Two-pass producer-order negotiation (runtime/negotiate.py): pass 1
    compiles with time-ordered layouts; wherever the pre-permuted
    gather-K form fired (an explicit transpose of X before the kernel),
    pass 2 asks X's PRODUCER to emit that order directly — the consumer
    then plans the kernel in place and the transpose disappears.  The
    cheaper scheme by the calibrated wall estimate wins.
    """
    order = None
    base_order = ctree.to_order_dfs()
    if fuse and lane_schedule and len(base_order) <= (
            lane_max_steps or LANE_SCHEDULE_MAX_STEPS):
        # reassociate small-operand chains so the big carrier is swept
        # once per combined gate block instead of once per gate
        # (runtime/fuse.py).  Every candidate rewrite is arbitrated by
        # the COMPILED scheme's wall estimate — the pass's internal
        # traffic model generates candidates but cannot see kernel
        # eligibility or layout effects.  Deterministic, so the
        # negotiation overrides and memo stay index-stable.  Gated by
        # the same step-count cutoff as kernel scheduling: pod-scale
        # MONOLITHIC programs must keep reference-compatible orders
        # (segmented callers raise lane_max_steps).
        import numpy as np

        from .fuse import reassociate_small_chains
        from .metrics import scheme_wall_estimate

        tn = ctree.tn
        final_qubits = list(tn.final_qubits)
        if isinstance(tn.final_qubits, (set, frozenset)):
            final_qubits = sorted(final_qubits)
        targets = np.array([[int(c) for c in s] for s in bitstrings],
                           dtype=np.uint8)

        def est_of(o):
            s, *_ = _compile_sparse(ctree, bitstrings, sc_target,
                                    lane_schedule, None, lane_max_steps,
                                    _order=o)
            return scheme_wall_estimate(s, 0)[0]

        state = {}

        def accept(cand):
            if "est" not in state:      # lazy: no candidates, no compile
                state["est"] = est_of(None)
            e = est_of(cand)
            if e < state["est"]:
                state["est"] = e
                return True
            return False

        order = reassociate_small_chains(
            base_order, tn.tensor_bonds, tn.bond_dims,
            targets=targets,
            qubit_of_tensor={tid: (q,) for q, tid
                             in enumerate(final_qubits)},
            accept=accept)

    if not lane_schedule or not negotiate:
        steps1, ob1, bits1, _ = _compile_sparse(
            ctree, bitstrings, sc_target, lane_schedule, None,
            lane_max_steps, _order=order)
        return steps1, ob1, bits1
    from .negotiate import negotiate as _negotiate

    memo = {}

    def compile_fn(overrides):
        steps, ob, bits, req = _compile_sparse(
            ctree, bitstrings, sc_target, lane_schedule, overrides,
            lane_max_steps, _memo=memo, _order=order)
        return (steps, ob, bits), steps, req

    return _negotiate(compile_fn)


_BATCH_LABELS = {"batch", "batch_i", "batch_j"}


def _layout_request_candidates(ix_x0, ix_w0, iy0, dim_of, h_block,
                               px_named):
    """Candidate output orders to request from X's producer, friendliest
    first.

    The minimal-hoist candidates keep X's STORED order and move only the
    consumer-contract legs found inside the trailing suffix window (the
    part the consumer needs as a lane-complete free run) to just before
    it — so an in-place GK producer keeps its f run (shrunk from the
    front, which its planner does anyway), its grid legs (order-free) and
    its H block (``h_block``; the insertion point steps before it rather
    than split it).  The full pre-permuted form ``px_named`` (every
    contract leg hoisted, tail in consumer-iy order) goes last: it is
    consumer-optimal but producer-hostile (measured: producers lose their
    kernels to h-contig / no-f-run when it is demanded verbatim)."""
    x_named = [b for b in ix_x0 if b not in _BATCH_LABELS]
    if len(x_named) != len(ix_x0) - (1 if ix_x0 and ix_x0[0]
                                     in _BATCH_LABELS else 0):
        return ()               # batch label in a non-leading slot
    w_set = set(ix_w0)
    out_set = set(iy0)
    cset = {b for b in x_named if b in w_set and b not in out_set}
    hset = set(h_block)
    cands = []
    for target in (1 << 15, 1 << 12):
        F = 1
        k = len(x_named)
        while k > 0 and F < target:
            l = x_named[k - 1]
            if l not in cset:
                F *= dim_of.get(l, 2)
            k -= 1
        hoisted = [l for l in x_named[k:] if l in cset]
        if not hoisted or F < 128:
            continue
        # never split the producer's H block: if the window boundary
        # lands inside it, insert the hoisted legs before the whole block
        p = k
        hpos = [n for n, l in enumerate(x_named) if l in hset]
        if hpos and hpos[0] < k <= hpos[-1]:
            p = hpos[0]
        hset_h = set(hoisted)
        cand = (tuple(x_named[:p]) + tuple(hoisted)
                + tuple(l for l in x_named[p:] if l not in hset_h))
        if len(cand) == len(x_named) and cand != tuple(x_named) \
                and cand not in cands:
            cands.append(cand)
    if px_named and px_named[0] in _BATCH_LABELS:
        px_named = px_named[1:]
    px = tuple(px_named)
    if px and not any(b in _BATCH_LABELS for b in px) and px not in cands:
        cands.append(px)
    return tuple(cands)


LANE_SCHEDULE_MAX_STEPS = 300


def _compile_sparse(ctree, bitstrings, sc_target, lane_schedule,
                    _overrides, lane_max_steps=None, _memo=None,
                    _order=None):
    order = _order if _order is not None else ctree.to_order_dfs()
    # pod-scale schemes keep reference-compatible residual orders by
    # default: the scheduler's order choices measurably crash this
    # environment's remote XLA compile helper on 400+-step MONOLITHIC
    # programs (docs/BENCH_NOTES.md).  Segmented callers compile small
    # programs and may raise the cutoff (lane_max_steps).
    if len(order) > (lane_max_steps or LANE_SCHEDULE_MAX_STEPS):
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

    time_of = _bond_contract_times(order, tn.tensor_bonds) \
        if lane_schedule else {}
    steps = []
    last = None
    produced_by = {}     # tensor id -> index of the step that wrote it
    fresh_of = {}        # tensor id -> legs its producing step took from
                         # its SMALL (W) operand — the producer kernel's
                         # H block, which any layout request must keep
                         # contiguous
    requests = {}        # producer step index -> tuple of candidate
                         # output bond orders (producer-friendliest first)
    for t, (i, j) in enumerate(order):
        bond_i, bond_j = bonds[i], bonds[j]
        common = sorted(set(bond_i) & set(bond_j), key=str)
        still_used = {
            b for b in common
            if any(b in bonds[t2] for t2 in bonds if t2 not in (i, j) and bonds[t2])
        }
        contracted = [b for b in common if b not in still_used]
        new_bonds = [b for b in bond_i if b not in contracted]
        new_bonds += [b for b in bond_j if b not in contracted and b not in new_bonds]

        q_i, rep_i = info[i]
        q_j, rep_j = info[j]
        lane = None
        note = None
        if lane_schedule and new_bonds and bond_i and bond_j:
            # TIME-ORDERED layout discipline: every output's legs sorted by
            # the step at which they get contracted (soonest first; open /
            # batch-destined legs last).  Inductively every step then sees
            # its contract legs LEADING and a long trailing free run — the
            # exact shape the gather-K kernel wants — with NO per-consumer
            # hint negotiation (round 2's hint fixpoint could never hoist a
            # leg out of a producer's protected minor run, which kept the
            # kernel chain broken).  Exception: unbatched big-big merges
            # take the pair kernel's (rows_i, rows_j) form instead.
            size_i = len(rep_i) * _prod_dims(dim_of, bond_i) \
                if q_i else _prod_dims(dim_of, bond_i)
            size_j = len(rep_j) * _prod_dims(dim_of, bond_j) \
                if q_j else _prod_dims(dim_of, bond_j)
            from .gatherk import HK_CAP, MIN_X_ELEMS
            # full re-sort when this step runs XLA anyway: too small for
            # gather-K, or a huge both-big merge beyond its W capacity.
            # The huge merges junction two preserved chains — paying their
            # one XLA output-reorder re-establishes the global invariant
            # instead of poisoning every downstream f run.  (A pair-form
            # variant with per-side sorted rows + the pair kernel's input
            # pre-permutes measured 1.88s vs 1.72s — the downstream GK
            # coverage it costs outweighs the full-MXU pair step.)
            new_bonds = _time_sorted_output(
                bond_i, bond_j, new_bonds, time_of,
                size_i >= size_j,
                full_sort=(max(size_i, size_j) < MIN_X_ELEMS
                           or (not q_i and not q_j
                               and min(size_i, size_j) > HK_CAP)),
                fresh_first=bool(q_i and q_j))
        if _overrides is not None and t in _overrides \
                and set(_overrides[t]) == set(new_bonds):
            new_bonds = list(_overrides[t])
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
            # the batch-merge products (rep, post_select, gathers) depend
            # only on the order sets, never on bond ORDER — memoized by
            # step index across negotiation trials (an override trial
            # changes output orders only; rebuilding the np.unique /
            # gather arrays per trial made a 10k-bitstring trial ~1 s)
            if _memo is not None and t in _memo:
                regime, rep, post_select, gathers = _memo[t]
            else:
                loc_i = [merged_q.index(q) for q in q_i]
                loc_j = [merged_q.index(q) for q in q_j]
                # unique required partial bitstrings over the merged
                # qubits, sorted lexicographically
                sub = np.unique(targets[:, merged_q], axis=0)
                need = _bits_to_ints(sub)
                full_cross = len(need) == 2 ** len(merged_q)
                cheap = len(merged_q) + len(new_bonds) <= sc_target
                if full_cross or cheap:
                    # ---- cross regime ---------------------------------
                    regime = "cross"
                    xb = _ints_to_bits(rep_i, len(q_i))
                    yb = _ints_to_bits(rep_j, len(q_j))
                    cross = np.zeros(
                        (len(rep_i), len(rep_j), len(merged_q)),
                        dtype=np.uint8)
                    cross[:, :, loc_i] = xb[:, None, :]
                    cross[:, :, loc_j] = yb[None, :, :]
                    rep = _bits_to_ints(cross.reshape(-1, len(merged_q)))
                    if len(need) != len(rep):
                        keep = np.sort(_lookup_positions(rep, need))
                        rep = rep[keep]
                        post_select = keep
                else:
                    # ---- aligned-gather regime ------------------------
                    regime = "aligned"
                    part_i = _bits_to_ints(sub[:, loc_i])
                    part_j = _bits_to_ints(sub[:, loc_j])
                    gi = _lookup_positions(rep_i, part_i)
                    gj = _lookup_positions(rep_j, part_j)
                    # target ROW ORDER is free (downstream metadata
                    # matches by rep VALUE, never position): lexsort the
                    # targets so one side's gather index repeats
                    # ADJACENTLY.  On the GGK kernel path an unchanged
                    # block index between consecutive programs skips the
                    # DMA entirely, so which side to group is a traffic
                    # question the kernel planner already models (runs-
                    # based fetch counts, plan_ggk_step) — plan BOTH
                    # candidate orders and keep the cheaper estimate.
                    # The n30 junction steps read 16k-element rows ~40x
                    # each under the round-3 more-reps-side sort
                    # (docs/BENCH_NOTES.md round 4).
                    sort_idx = None
                    if lane_schedule:
                        from .gatherk import plan_ggk_step as _pggk
                        best_est = None
                        for cand in (np.lexsort((gj, gi)),
                                     np.lexsort((gi, gj))):
                            p = _pggk(tuple(bond_i), tuple(bond_j),
                                      tuple(new_bonds), tuple(dims_bi),
                                      tuple(dims_bj), gi[cand], gj[cand],
                                      len(rep_i), len(rep_j))
                            if p is not None and (best_est is None
                                                  or p.est_s < best_est):
                                best_est, sort_idx = p.est_s, cand
                    if sort_idx is None:
                        # no kernel form: near-sequential gathers on the
                        # larger-batch side (XLA-take locality)
                        major = gi if len(rep_i) >= len(rep_j) else gj
                        sort_idx = np.argsort(major, kind="stable")
                    gi, gj, rep = gi[sort_idx], gj[sort_idx], need[sort_idx]
                    B = len(rep)
                    overshoot = log2(B) + max(len(bond_i), len(bond_j)) \
                        - (sc_target - 2)
                    n_chunks = min(2 ** ceil(max(0.0, overshoot)), B)
                    if n_chunks > 1:
                        # ceil-based chunking covers ALL B rows (the
                        # reference's floor-based variant,
                        # contraction.py:291-297, drops tail elements
                        # when B % n_chunks > chunk length)
                        L = -(-B // n_chunks)
                        n_chunks = -(-B // L)
                        gathers = tuple(
                            (gi[c * L:(c + 1) * L], gj[c * L:(c + 1) * L])
                            for c in range(n_chunks))
                    else:
                        gathers = ((gi, gj),)
                if _memo is not None:
                    _memo[t] = (regime, rep, post_select, gathers)
            if regime == "cross":
                BI, BJ = "batch_i", "batch_j"
                ix_i, ix_j = (BI, *bond_i), (BJ, *bond_j)
                iy = (BI, BJ, *new_bonds)
                dims_i = (len(rep_i), *dims_bi)
                dims_j = (len(rep_j), *dims_bj)
                rest = 1
                for b in new_bonds:
                    rest *= dim_of[b]
                # physical 2-D target merging the two batch axes
                # (left-major)
                reshape = ((len(rep_i) * len(rep_j), rest)
                           if new_bonds else (len(rep_i) * len(rep_j),))
            else:
                Bl = "batch"
                ix_i, ix_j = (Bl, *bond_i), (Bl, *bond_j)
                iy = (Bl, *new_bonds)
                dims_i = dims_j = None  # chunked: dims vary per chunk

        iy0 = tuple(iy)
        ix_i0, ix_j0 = tuple(ix_i), tuple(ix_j)
        ix_i, ix_j, iy = _relabel(ix_i, ix_j, iy)
        if gathers is not None:
            lowered = None
            lowered_chunks = tuple(
                lower_step(ix_i, ix_j, iy,
                           (len(gi), *dims_bi), (len(gi), *dims_bj))
                for gi, gj in gathers)
            if lane is None and lane_schedule:
                # gathered gather-K: the whole aligned merge as ONE kernel
                # whose scalar-prefetched row indices drive the block DMA —
                # no materialized take copies, no chunking (the chunked
                # lowering above stays as the CPU/XLA fallback)
                from . import gatherk
                from .gatherk import plan_ggk_step

                gatherk.LAST_REJECT = None
                lane = plan_ggk_step(
                    tuple(bond_i), tuple(bond_j), tuple(new_bonds),
                    tuple(dims_bi), tuple(dims_bj),
                    np.concatenate([g[0] for g in gathers]),
                    np.concatenate([g[1] for g in gathers]),
                    len(rep_i), len(rep_j))
                if lane is None:
                    note = str(gatherk.LAST_REJECT)
                elif isinstance(lane.row, gatherk.RGRow):
                    # an aligned reduction step pays two serial XLA
                    # relayouts the kernel cannot fuse: the canonical
                    # (F, K) pre-reorder of X and the wk take of W.
                    # BOTH die with one producer move when X's producer
                    # emits (frees in iy order, contract in W's STORED
                    # digit order): px == stored kills the pre-reorder,
                    # and the X/W digit agreement makes wk_idx identity
                    # (est charges both additively, so the negotiation
                    # driver sees the win).  Asking W's producer instead
                    # measured as a dead end: the n30 junction's W comes
                    # from another GGK step whose kernel cannot survive
                    # the order change (hard guard).  Labels here are
                    # this step's original bond labels: exactly the
                    # producer's output order space.
                    rrow = lane.row
                    x_tid = i if lane.w_is_j else j
                    xb, wb = (bond_i, bond_j) if lane.w_is_j \
                        else (bond_j, bond_i)
                    cset = (set(xb) & set(wb)) - set(new_bonds)
                    frees = [l for l in new_bonds if l in set(xb)]
                    cand_w = tuple(frees) + tuple(
                        l for l in wb if l in cset)
                    cands = (cand_w,)
                    if rrow.px is not None and tuple(rrow.px) != cand_w:
                        cands += (tuple(rrow.px),)
                    cands = tuple(c for c in cands if c != tuple(xb))
                    prod = produced_by.get(x_tid)
                    if cands and prod is not None \
                            and prod not in requests \
                            and prod not in (_overrides or {}):
                        requests[prod] = cands
        else:
            lowered = lower_step(ix_i, ix_j, iy, dims_i, dims_j)
            lowered_chunks = None
            if lane is None and lane_schedule:
                # kernel selection against the (time-ordered) output order:
                # gather-K first (covers scattered-K small-W forms incl.
                # cross merges — the two batch axes are ordinary grid/H
                # legs to it), then the v1 lane kernel, then the both-big
                # pair kernel (its (rows_i, rows_j) form was chosen above)
                from . import gatherk, lanes
                from .gatherk import plan_gk_step
                from .lanes import plan_lane_step, plan_pair_step

                gatherk.LAST_REJECT = None
                lane = plan_gk_step(ix_i, ix_j, iy, dims_i, dims_j)
                note = f"gk:{gatherk.LAST_REJECT}"
                if lane is None:
                    lanes.LAST_REJECT = None
                    lane = plan_lane_step(ix_i, ix_j, iy, dims_i, dims_j)
                    note += f"/v1:{lanes.LAST_REJECT}"
                if lane is None:
                    lane = plan_pair_step(ix_i, ix_j, iy, dims_i, dims_j)
                    note += f"/pair:{lanes.LAST_REJECT}"
                if lane is None:
                    # no-f-run residuals: permute X once (explicit cheap
                    # transpose, iy unchanged) into a GK-friendly order
                    from .gatherk import plan_gk_step_pre
                    gatherk.LAST_REJECT = None
                    lane = plan_gk_step_pre(ix_i, ix_j, iy, dims_i, dims_j)
                    note += f"/pregk:{gatherk.LAST_REJECT or 'no-form'}" \
                        if lane is None else "/pregk:ok"
                if (lane is None and reshape is None
                        and max(_prod_dims(dim_of, bond_i)
                                * (len(rep_i) if batched_i else 1),
                                _prod_dims(dim_of, bond_j)
                                * (len(rep_j) if batched_j else 1))
                        >= (1 << 20)):
                    # second chance on the residual hot steps: let the v1
                    # scheduler CHOOSE the output order with the TAIL
                    # orientation enabled — every surviving hot step has a
                    # deep contract cluster + tiny trailing run, exactly
                    # the v1 tail-lane shape (contract legs lane-resident
                    # at the minor end, front cluster as combos)
                    from .lanes import schedule_step
                    old_or = lanes.ORIENTATIONS
                    lanes.ORIENTATIONS = ("head", "tail")
                    try:
                        big_i = int(np.prod(dims_i)) >= int(np.prod(dims_j))
                        batch_rel = None
                        if batched_i or batched_j:
                            batch_rel = ix_i[0] if batched_i else ix_j[0]
                        pin = 1 if (batch_rel is not None
                                    and ((big_i and batched_i)
                                         or (not big_i and batched_j))) \
                            else 0
                        iy2, lane2 = schedule_step(
                            ix_i, ix_j, set(iy), dims_i, dims_j, pin=pin)
                        ok = lane2 is not None and (
                            batch_rel is None or iy2[0] == batch_rel)
                        if ok:
                            lane = lane2
                            orig_of = dict(zip(iy, iy0))
                            new_bonds = [orig_of[l] for l in iy2
                                         if not str(orig_of[l]).startswith(
                                             "batch")]
                            bonds[i] = new_bonds
                            iy = tuple(iy2)
                            lowered = lower_step(ix_i, ix_j, iy,
                                                 dims_i, dims_j)
                            note += "/retail:ok"
                    finally:
                        lanes.ORIENTATIONS = old_or
                if (lane is None and "/pair:pair-iy" in note
                        and t not in (_overrides or {})
                        and t not in requests):
                    # the step's OWN output order blocks the both-big pair
                    # kernel (iy interleaves the two operands' rows):
                    # request grouped orders for THIS step — within each
                    # group the time-sorted order is kept, so downstream
                    # consumers see at most a two-run relayout — and let
                    # the negotiation driver judge the global estimate
                    set_bi = set(bond_i)
                    gi_ = [l for l in new_bonds if l in set_bi]
                    gj_ = [l for l in new_bonds if l not in set_bi]
                    if gi_ and gj_:
                        cands = tuple(
                            c for c in ((*gi_, *gj_), (*gj_, *gi_))
                            if c != tuple(new_bonds))
                        if cands:
                            requests[t] = cands
                if (lane is None and "h-contig" in note
                        and t not in (_overrides or {})
                        and t not in requests):
                    # time-sorting scattered the small operand's fresh
                    # legs (the gather-K H block must be iy-contiguous,
                    # common on FUSED gate blocks whose fresh legs have
                    # different contract times): request this step's own
                    # order with the H legs grouped at their first
                    # occurrence — negotiation judges downstream effects
                    big_i = _prod_dims(dim_of, bond_i) * (
                        len(rep_i) if batched_i else 1) >= \
                        _prod_dims(dim_of, bond_j) * (
                        len(rep_j) if batched_j else 1)
                    wb = (set(bond_j) - set(bond_i)) if big_i \
                        else (set(bond_i) - set(bond_j))
                    hs = [l for l in new_bonds if l in wb]
                    if 0 < len(hs) < len(new_bonds):
                        rest = [l for l in new_bonds if l not in wb]
                        if batched_i != batched_j:
                            # iy leads with the batch axis, which counts
                            # as a fresh W leg too: the bond H legs must
                            # sit directly after it
                            pos = 0
                        else:
                            pos = sum(1 for l in new_bonds[
                                :new_bonds.index(hs[0])] if l not in wb)
                        cand = tuple(rest[:pos] + hs + rest[pos:])
                        if cand != tuple(new_bonds):
                            requests[t] = (cand,)
        from .gatherk import GKPlan as _GKPlan
        if (isinstance(lane, _GKPlan)
                and lane.pre is not None and lane.px is not None
                and (_overrides is None
                     or produced_by.get(i if lane.w_is_j else j)
                     not in _overrides)):
            # ask X's producer to emit a GK-friendly order directly
            x_tid = i if lane.w_is_j else j
            ix_x0 = ix_i0 if lane.w_is_j else ix_j0
            orig_of_x = dict(zip(ix_i if lane.w_is_j else ix_j, ix_x0))
            prod = produced_by.get(x_tid)
            if prod is not None and prod not in requests:
                cands = _layout_request_candidates(
                    ix_x0, ix_j0 if lane.w_is_j else ix_i0, iy0,
                    dim_of, fresh_of.get(x_tid, ()),
                    [orig_of_x[l] for l in lane.px])
                if cands:
                    requests[prod] = cands
        steps.append(SparseStep(i, j, ix_i, ix_j, iy,
                                gathers, reshape, post_select,
                                lowered, lowered_chunks, lane, note))
        info[i] = (merged_q, rep)
        produced_by[i] = t
        small_j = _prod_dims(dim_of, bond_i) >= _prod_dims(dim_of, bond_j)
        sm, bg = (bond_j, bond_i) if small_j else (bond_i, bond_j)
        fresh_of[i] = tuple(b for b in new_bonds
                            if b in set(sm) and b not in set(bg))
        last = i

    out_reps = info[last][1]
    bitstrings_sorted = ["".join(map(str, row))
                         for row in _ints_to_bits(out_reps, n_qubits)]
    if lane_schedule:
        from .lanes import prune_lane_plans

        prune_lane_plans(steps)
    return steps, bonds[last], bitstrings_sorted, requests


def apply_sparse_step(field, x, y, s):
    """One sparse step on flat-stored field tensors (traceable)."""
    from .lowering import apply_lowered

    if s.gathers is not None:
        if s.lane is not None and getattr(field, "supports_lanes", False):
            from .gatherk import apply_ggk_step

            return apply_ggk_step(field, x, y, s.lane)
        parts = [
            apply_lowered(field, field.take(x, gi, axis=0),
                          field.take(y, gj, axis=0), low)
            for (gi, gj), low in zip(s.gathers, s.lowered_chunks)
        ]
        return parts[0] if len(parts) == 1 else field.concat(parts, axis=0)
    if s.lane is not None and getattr(field, "supports_lanes", False):
        from .gatherk import GKPlan, apply_gk_step
        from .lanes import PairPlan, apply_lane_step, apply_pair_step

        if isinstance(s.lane, GKPlan):
            out = apply_gk_step(field, x, y, s.lane)
        elif isinstance(s.lane, PairPlan):
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
