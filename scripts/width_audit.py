"""Audit the at-width HBM peak model against committed plans.

For each bench plan: print the modeled peak at each candidate width,
the chosen width, and a decomposition of the ARGMAX timeline point —
which step, and what it charges (live dyn/static, out, wk take,
relayout copy).  Host-only (scheme cache); VERDICT r4 item 4.

Usage: JAX_PLATFORMS=cpu python scripts/width_audit.py [plan] [nbits]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PLAN = sys.argv[1] if len(sys.argv) > 1 else "plans/n30_m14_sparse_sc22_r2.json"
NBITS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def main():
    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.runtime import metrics
    from artensor_tpu.runtime.executor import build_slicing_axes
    from artensor_tpu.runtime.scheme_cache import cached_scheme_sparse

    with open("/root/reference/examples/"
              "amplitudes_n30_m14_s0_e0_pEFGH_10000.txt") as f:
        bits = [ln.split()[0] for ln in f if ln.strip()][:NBITS]
    n, layers = load_cirq_circuit(
        "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py")
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    order, sliced, ctree = plan_io.load_plan(PLAN)
    sc = float(PLAN.rsplit("sc", 1)[1].split("_")[0].split(".")[0])
    steps, ob, bs = cached_scheme_sparse(PLAN, ctree, bits, sc_target=sc)
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)

    timeline, unit = metrics._peak_timeline(steps, axes)
    for w in (32, 64, 128, 256):
        pk = metrics.scheme_peak_bytes_at_width(steps, w, axes)
        i = int(np.argmax([w * d + s for d, s in timeline]))
        d, s = timeline[i]
        print(f"w={w:4d}: peak {pk/2**30:7.2f} GiB   argmax point {i} "
              f"(dyn {d*unit*w/2**30:.2f} GiB, static {s*unit/2**30:.2f} GiB)")
    chosen = metrics.choose_slice_width(steps, len(sliced),
                                        slicing_axes=axes)
    est, w_est, peak1 = metrics.scheme_wall_estimate(
        steps, len(sliced), slicing_axes=axes)
    print(f"chosen width {chosen} (est {est:.3f} s)  per-slice peak "
          f"{peak1/2**30:.2f} GiB")

    # decompose the top-3 timeline points at width 128.  GGK steps emit
    # TWO points (kernel / relayout) — build the point -> step map the
    # same way _peak_timeline walks.
    scored = sorted(range(len(timeline)),
                    key=lambda i: -(128 * timeline[i][0] + timeline[i][1]))
    real_steps = []
    for st in steps:
        if getattr(st, 'lowered', None) is None \
                and not getattr(st, 'lowered_chunks', None):
            continue
        lane = getattr(st, 'lane', None)
        if lane is not None and hasattr(lane, 'bj_rows'):
            if getattr(lane.row, 'pre_perm', None) is not None:
                real_steps.append((st, 'pre'))
            real_steps.append((st, 'A'))
            real_steps.append((st, 'B'))
        else:
            real_steps.append((st, 'A'))
    print("\ntop timeline points at w=128 (point 0 = initial live set):")
    for i in scored[:4]:
        d, s = timeline[i]
        tot = (128 * d + s) * unit / 2**30
        tag = ""
        if i > 0 and i - 1 < len(real_steps):
            st, phase = real_steps[i - 1]
            tag = f" phase={phase}"
            lane = getattr(st, "lane", None)
            kind = ("GGK" if lane is not None and hasattr(lane, "bj_rows")
                    else "lane" if lane is not None
                    else "chunked" if getattr(st, "gathers", None) is not None
                    else "xla")
            tag += f" ({st.i},{st.j}) kind={kind}"
            if kind == "GGK":
                row = lane.row
                wk = lane.bj_rows * row.H * row.K
                lows = [st.lowered] if st.lowered is not None \
                    else list(st.lowered_chunks)
                out = sum(int(np.prod(low.phys_y)) for low in lows)
                tag += (f" wk={wk*unit/2**30:.2f}GiB "
                        f"out={out*unit*128/2**30:.2f}GiB@w128")
        print(f"  pt {i}: {tot:7.2f} GiB (dyn@128 {128*d*unit/2**30:.2f}, "
              f"st {s*unit/2**30:.2f}){tag}")


if __name__ == "__main__":
    main()
