"""Contraction cost model: tc / sc / mc with the big-batch multiconfig factor.

All quantities live in log space:
  tc : log2 of the multiply-add count of one pairwise contraction step
  sc : log2 of the element count of the step's result tensor
  mc : log2 of the memory (elements) live during the step
       (operand + operand + result, via a stable log-sum-exp)

The "multiconfig factor" accounts for the amplitude-batch axis threaded
through subtrees that contain final-qubit tensors: a subtree containing f
final qubits carries a batch axis of size min(2^f, max_bitstring), so both tc
and sc grow by min(f, log2(max_bitstring)).

Parity anchors (reference: /root/reference/artensor/contraction_tree.py:53-114
and /root/reference/artensor/order_finder.py:11-16). The outer-product "-1"
adjustment of the reference (tc loses one factor of 2 when no bond is summed)
is preserved so planner scores are comparable.
"""

from math import log10

from ..utils import log2sumexp2

LOG10_2 = log10(2.0)


def score(tc, sc, mc, sc_target=30.0, alpha=32.0, sc_weight=2.0):
    """Scalar planner objective: smaller is better.

    log10(alpha * 10^mc + 10^tc) penalized by 2*log10(2) per unit of sc above
    the memory budget ``sc_target`` (log2 elements of the largest allowed
    intermediate).
    """
    if alpha > 0.0:
        m = max(mc + log10(alpha), tc)
        body = m + log10(alpha * 10.0 ** (mc - m) + 10.0 ** (tc - m))
    else:
        body = tc
    return body + sc_weight * LOG10_2 * max(0.0, sc - sc_target)


# Measured hardware envelope of the target chip (one v5e core through the
# axon tunnel, round-2 microbenchmarks): dense f32(HIGHEST) matmul rate
# 28.6 TFLOP/s (= 28.6e12/8 complex mul-adds/s with the naive 4-dot split)
# and ~450 GB/s achieved HBM stream rate (pure streams measure 420-512).
TPU_COMPLEX_MULADD_PER_S = 28.6e12 / 8.0
TPU_HBM_BYTES_PER_S = 450e9
MXU_K_FULL = 128.0      # systolic contraction width: a step contracting
                        # K < 128 bond values uses only K/128 of the MXU
STEP_OVERHEAD_S = 3e-6  # per-step dispatch/layout overhead (measured-ish)

# Per-step fixed cost at slice-vmap width 1 and the HBM-bound width cap.
# Measured round 3 (scripts/gk_ab.py): the n30 scheme runs 59 ms/slice at
# width 1 vs 9.2 ms at width 128 — small steps carry a ~0.33 ms fixed cost
# that slice batching amortizes, and the usable width is capped by HBM
# (~2^(27 - sc) for this workload's live-set shape: sc22 ran at 128,
# sc23 OOMed at 32, sc24 at 8).  A roofline that ignores this prefers
# big-slice plans that then CANNOT batch wide and run 3-5x slower.
STEP_OVERHEAD_W1_S = 330e-6
# Usable HBM for the slice-vmap live set.  Measured (round-3 width sweep):
# the sc22 scheme whose temp-aware peak models 0.103 GB/slice runs at
# width 128 (13.2 GB modeled) on the 15.75 GB chip — 12e9 wrongly capped
# it at 64 (1.31s vs 1.12s measured).  14e9 keeps ~1.7 GB margin for
# staged leaf tensors and XLA scratch.
HBM_BUDGET_BYTES = 14e9


def slice_vmap_width(mc_log2):
    """HBM-limited slice-vmap width for a plan whose live set is 2^mc
    elements (8 bytes each as a split-complex pair)."""
    w = HBM_BUDGET_BYTES / (8.0 * 2.0 ** mc_log2)
    return max(1.0, min(w, 256.0))


def step_overhead_for(mc_log2):
    """Width-aware per-step overhead for the roofline objective."""
    return max(STEP_OVERHEAD_S,
               STEP_OVERHEAD_W1_S / slice_vmap_width(mc_log2))


def tree_roofline_seconds(tree, bytes_per_elem=8.0,
                          muladds_per_s=TPU_COMPLEX_MULADD_PER_S,
                          bytes_per_s=TPU_HBM_BYTES_PER_S,
                          step_overhead_s=None):
    """Predicted per-slice wall seconds under a two-resource roofline.

    Each contraction step costs max(compute, HBM traffic) + overhead:
    traffic = reading both operands + writing the result once (the fused
    minimum); compute is discounted by the MXU's contraction-width
    utilization min(1, K/128) — the round-2 profiling showed the hot
    steps of flop-optimal plans contract only K in {8..32} bond values,
    capping the MXU at <= 25% no matter how the executor is written.
    Unlike the pure log-flop score this exposes both the memory-bound
    tall-skinny steps AND the small-K penalty that dominate real TPU wall
    clock (a measured 9%-fewer-flops plan ran 27% slower; an sc21 plan
    with 40% fewer flops ran ~10x slower).
    """
    if step_overhead_s is None:
        # PEAK live set (max per-step mc), not the aggregate tree mc —
        # the executor frees consumed buffers, so only the largest step's
        # live set constrains the slice-vmap width
        mcs = [v.mc for v in tree.nodes_root_to_leaves() if not v.is_leaf()]
        step_overhead_s = step_overhead_for(max(mcs, default=0.0))
    total = 0.0
    for v in tree.nodes_root_to_leaves():
        if v.is_leaf():
            continue
        # contract size: tc = log2(all bond product)+mf, sc = log2(out)+mf
        k = 2.0 ** max(0.0, v.tc - v.sc)
        rate = muladds_per_s * min(1.0, k / MXU_K_FULL)
        compute = (2.0 ** v.tc) / rate
        traffic = bytes_per_elem * (
            2.0 ** v.left.sc + 2.0 ** v.right.sc + 2.0 ** v.sc) / bytes_per_s
        total += max(compute, traffic) + step_overhead_s
    return total


def plan_roofline_seconds(tree):
    """Whole-plan prediction: per-slice roofline x 2^(#sliced bonds)."""
    return tree_roofline_seconds(tree) * 2.0 ** len(tree.tn.sliced)


def leaf_cost(tn, tensor_id):
    """(tc, sc, mfactor) of a leaf: no FLOPs, storage = its bonds (+ batch)."""
    mfactor = min(tn.log2_max_bitstring, float(tn.num_fq[tensor_id]))
    sc = sum(_log2(tn.bond_dims[b]) for b in tn.tensor_bonds[tensor_id]) + mfactor
    return 0.0, sc, mfactor


def _log2(x):
    from math import log2
    return log2(x)


def merge_cost(tn, left, right):
    """Cost of contracting two subtrees (planner nodes).

    ``left`` / ``right`` expose: ``boundary`` (dict bond -> leaf refcount,
    restricted to bonds not yet fully contracted), ``sc``, ``mfactor``.

    Returns (tc, sc, mfactor, boundary, mc, contract_bonds, all_bonds_set).
    """
    dims = tn.bond_dims
    degree = tn.bond_tensors
    merged = dict(left.boundary)
    contract_bonds = set()
    for b, c in right.boundary.items():
        if b in merged:
            c = merged[b] + c
            if c == len(degree[b]):
                contract_bonds.add(b)
        merged[b] = c
    log2_all = 0.0
    log2_out = 0.0
    boundary = {}
    for b, c in merged.items():
        d = _log2(dims[b])
        log2_all += d
        if b in contract_bonds:
            continue
        log2_out += d
        boundary[b] = c
    combined = left.mfactor + right.mfactor
    mfactor = min(tn.log2_max_bitstring, combined)
    tc = (log2_all if contract_bonds else log2_all - 1.0) + mfactor
    sc = log2_out + mfactor
    if combined > tn.log2_max_bitstring:
        # batch axes of both operands get aligned to the merged batch
        mc = log2sumexp2([
            left.sc - left.mfactor + mfactor,
            right.sc - right.mfactor + mfactor,
            sc,
        ])
    else:
        mc = log2sumexp2([left.sc, right.sc, sc])
    return tc, sc, mfactor, boundary, mc, contract_bonds, merged
