"""torch-CPU reference baseline: execute a committed plan's compiled
scheme with the REFERENCE implementation's execution model — one
torch.einsum per step, one torch gather per aligned operand, row
index-select for cross merges — mirroring
/root/reference/artensor/contraction.py:62-77 (tensor_contraction) and
:132-205 (tensor_contraction_sparse), on the CPU available here.

This is the vs_baseline methodology of docs/BENCH_NOTES.md: the
reference publishes no numbers and this environment has no CUDA device,
so the baseline is the reference's execution model on the same
plan/scheme on CPU.  Timing is per SLICE; the total is slices x
per-slice (the reference runs slices sequentially).

Usage: python scripts/torch_baseline.py {sparse1k|sparse10k|dense|n53}
                                        [n_slices=1]
Prints the measured s/slice and the extrapolated total.
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

REF30 = "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py"
REF30_AMPS = ("/root/reference/examples/"
              "amplitudes_n30_m14_s0_e0_pEFGH_10000.txt")
N53 = ("/root/reference/examples/circuits/"
       "circuit_n53_m20_s0_e0_pABCDCDAB.qsim")

CONFIGS = {
    "sparse1k": dict(kind="sparse", plan="plans/n30_m14_sparse_sc22_r2.json",
                     nbits=1000, circ=REF30, sc=22),
    "sparse10k": dict(kind="sparse", plan="plans/n30_m14_sparse_sc22.json",
                      nbits=10000, circ=REF30, sc=22),
    "dense": dict(kind="dense", plan="plans/n30_m14_dense_blocks64_sc26.json",
                  circ=REF30, sc=26),
    "n53": dict(kind="sparse", plan="plans/n53_m20_sparse_sc24.json",
                nbits=1000, circ=N53, sc=24),
}


def np_slice_select(bufs, axes, sid, k):
    """Numpy mirror of runtime.executor.slice_select, but keeping the
    LOGICAL shape (the torch einsum path uses per-bond labels, not the
    flat physical staging the jax executor lowers to)."""
    bufs = list(bufs)
    for x, entries in enumerate(axes):
        bit = (sid >> (k - 1 - x)) & 1
        for tid, ax, dims, phys in entries:
            bufs[tid] = np.take(bufs[tid].reshape(dims), bit, axis=ax)
    return bufs


def torch_execute_sparse(torch, bufs, steps):
    """Per-step torch ops exactly as the reference's sparse executor:
    gathered operand copies + batch-shared einsum for aligned chunks,
    full-cross einsum + row select for cross merges
    (/root/reference/artensor/contraction.py:132-205)."""
    for s in steps:
        x, y = bufs[s.i], bufs[s.j]
        li, lj, ly = list(s.ix_i), list(s.ix_j), list(s.iy)
        if s.gathers is not None:
            parts = []
            for gi, gj in s.gathers:
                xg = torch.index_select(
                    x, 0, torch.from_numpy(np.ascontiguousarray(gi))
                    .long())
                yg = torch.index_select(
                    y, 0, torch.from_numpy(np.ascontiguousarray(gj))
                    .long())
                parts.append(torch.einsum(xg, li, yg, lj, ly))
            out = parts[0] if len(parts) == 1 else torch.cat(parts, dim=0)
        else:
            out = torch.einsum(x, li, y, lj, ly)
        if s.reshape is not None:
            # cross merge: fold the two batch axes (leading in iy) into one
            # row axis, KEEPING the remaining legs logical (the jax path
            # reshapes to flat physical form, but this executor's labels
            # are per-bond)
            out = out.reshape((out.shape[0] * out.shape[1],)
                              + tuple(out.shape[2:]))
        if s.post_select is not None:
            out = torch.index_select(
                out, 0, torch.from_numpy(
                    np.ascontiguousarray(s.post_select)).long())
        bufs[s.i] = out
        bufs[s.j] = None
    return out


def torch_execute_dense(torch, bufs, steps):
    for s in steps:
        bufs[s.i] = torch.einsum(bufs[s.i], list(s.ix_i),
                                 bufs[s.j], list(s.ix_j), list(s.iy))
        bufs[s.j] = None
    return bufs[steps[-1].i]


def main():
    import torch

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.runtime.executor import build_slicing_axes

    torch.set_num_threads(max(torch.get_num_threads(), 1))
    name = sys.argv[1] if len(sys.argv) > 1 else "sparse1k"
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cfg = CONFIGS[name]

    if cfg["circ"].endswith(".qsim"):
        circ = TensorNetworkCircuit(cfg["circ"])
    else:
        n, layers = load_cirq_circuit(cfg["circ"])
        circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    order, sliced, ctree = plan_io.load_plan(cfg["plan"])

    if cfg["kind"] == "sparse":
        from artensor_tpu.runtime.sparse import contraction_scheme_sparse

        tb2, fq2 = ntn.simplify("sparse")
        if name == "n53":
            rng = np.random.default_rng(0)
            bits = sorted({"".join(map(str, row)) for row in
                           rng.integers(0, 2, size=(1000, circ.n))})
        else:
            with open(REF30_AMPS) as f:
                bits = [ln.split()[0] for ln in f
                        if ln.strip()][:cfg["nbits"]]
        steps, ob, bs = contraction_scheme_sparse(
            ctree, bits, sc_target=cfg["sc"])
        axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2,
                                  bond_dims=ntn.bond_dims)
        k = len(sliced)
        execute = torch_execute_sparse
    else:
        from artensor_tpu.runtime import scheme as sch
        from artensor_tpu.simulation import _bond_sort_key, get_bond_tensors

        tb2, fq2 = ntn.simplify("normal")
        steps, out_bonds = sch.contraction_scheme(ctree)
        bt = get_bond_tensors(tb2)
        open_bonds = sorted((b for b, ts in bt.items() if len(ts) == 1),
                            key=_bond_sort_key)
        sliced = open_bonds[:6] + sliced   # output-block legs lead
        axes = build_slicing_axes(tb2, sliced, bond_dims=ntn.bond_dims)
        k = len(sliced)
        execute = torch_execute_dense

    host = [np.asarray(ntn.tensors[i], dtype=np.complex64)
            for i in range(len(ntn.tensors))]
    total = 2 ** k
    walls = []
    for sid in range(min(n_slices, total)):
        sl = np_slice_select(host, axes, sid, k)
        bufs = {i: torch.from_numpy(np.ascontiguousarray(t))
                for i, t in enumerate(sl)}
        t0 = time.time()
        out = execute(torch, bufs, steps)
        _ = out.reshape(-1)[0].item()      # force
        walls.append(time.time() - t0)
        print(f"slice {sid}: {walls[-1]:.2f}s", flush=True)
    per = float(np.median(walls))
    print(f"{name}: {per:.2f} s/slice x {total} slices = "
          f"{per * total:.1f} s total (torch CPU, "
          f"{torch.get_num_threads()} threads)")


if __name__ == "__main__":
    main()
