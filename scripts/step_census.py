"""Census of the headline-scheme steps: which executor path each takes and
where the modeled time goes.  Run on any backend (host-side only — nothing
is executed); guides kernel-coverage work (VERDICT round-2 item 1).

Usage: python scripts/step_census.py [plan.json] [n_bitstrings]
"""

import sys
from collections import defaultdict

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

REF_CIRCUIT = "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py"
REF_AMPLITUDES = ("/root/reference/examples/"
                  "amplitudes_n30_m14_s0_e0_pEFGH_10000.txt")


def classify(s):
    if s.gathers is not None:
        if s.lane is not None:
            return f"aligned+{type(s.lane).__name__}"
        return f"aligned[{len(s.gathers)}ch]"
    kind = "cross" if s.reshape is not None else "plain"
    if s.lane is not None:
        lane = type(s.lane).__name__
        return f"{kind}+{lane}"
    return f"{kind}+XLA[{getattr(s, 'note', None)}]"


def main():
    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.runtime import metrics as mt
    from artensor_tpu.runtime.lowering import _prod
    from artensor_tpu.runtime.sparse import contraction_scheme_sparse

    plan = sys.argv[1] if len(sys.argv) > 1 else "plans/n30_m14_sparse_sc22.json"
    n_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    import re as _re
    sc_target = float(_re.search(r"sc(\d+)", plan).group(1))

    with open(REF_AMPLITUDES) as f:
        bitstrings = [ln.split()[0] for ln in f if ln.strip()][:n_bits]

    n, layers = load_cirq_circuit(REF_CIRCUIT)
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    ntn.simplify("sparse")
    order, sliced, ctree = plan_io.load_plan(plan)
    steps, out_bonds, bits_sorted = contraction_scheme_sparse(
        ctree, bitstrings, sc_target=sc_target)

    groups = defaultdict(lambda: [0, 0.0, 0.0, 0.0])  # n, est_s, flops, bytes
    rows = []
    for k, s in enumerate(steps):
        cls = classify(s)
        lows = [s.lowered] if s.lowered is not None else list(s.lowered_chunks)
        fl = sum(mt.step_flops(low) for low in lows)
        by = sum(mt.step_traffic_bytes(low) for low in lows)
        if s.lane is not None:
            est = s.lane.est_s
        else:
            est = 0.0
            for low in lows:
                (cx, _cy), (bx, _by) = low.dnums
                kk = _prod(low.shape_l[d] for d in cx)
                rate = 14.3e12 * min(1.0, kk / 128.0)
                est += max(mt.step_flops(low) / rate,
                           mt.step_traffic_bytes(low) / 450e9)
        g = groups[cls]
        g[0] += 1
        g[1] += est
        g[2] += fl
        g[3] += by
        rows.append((est, k, cls, fl, by, s))

    total_est = sum(g[1] for g in groups.values())
    print(f"plan={plan} steps={len(steps)} slices=2^{len(sliced)} "
          f"est/slice={total_est * 1e3:.2f}ms "
          f"est total={total_est * 2 ** len(sliced):.2f}s")
    print(f"{'class':28s} {'n':>4s} {'est_s/slice':>12s} {'%':>5s} "
          f"{'GF/slice':>9s} {'GB/slice':>9s}")
    for cls, (cnt, est, fl, by) in sorted(groups.items(), key=lambda kv: -kv[1][1]):
        print(f"{cls:28s} {cnt:4d} {est * 1e3:10.2f}ms "
              f"{est / total_est * 100:4.0f}% {fl / 1e9:9.2f} {by / 1e9:9.3f}")

    print("\ntop 20 steps by est time:")
    rows.sort(key=lambda r: -r[0])
    for est, k, cls, fl, by, s in rows[:20]:
        shp_i = None
        if s.lowered is not None:
            shp = f"l{s.lowered.shape_l} r{s.lowered.shape_r} " \
                  f"dn{s.lowered.dnums} re={s.lowered.re_out.mode if s.lowered.re_out else '-'}"
        else:
            low = s.lowered_chunks[0]
            shp = f"[{len(s.lowered_chunks)}ch] l{low.shape_l} r{low.shape_r} dn{low.dnums}"
        print(f"  #{k:3d} {cls:24s} {est * 1e3:7.3f}ms {fl / 1e9:8.2f}GF "
              f"{by / 1e9:7.3f}GB  {shp}")
        print(f"       ix_i={s.ix_i} ix_j={s.ix_j}")
        print(f"       iy  ={s.iy}")


if __name__ == "__main__":
    main()
