"""Microbench representative hot steps of the headline scheme on the chip.

For each selected step, times several executions of the SAME lowered step
(scan over R iterations, readback-forced — the async tunnel makes naive
timing meaningless):

  xla        the production path: multi-dim dot_general + explicit reorder
  xla-nore   the dot alone, natural output order (isolates reorder cost)
  fused      FusedField single-dot execution (W4 expansion)
  stream     copy X+Y traffic at f32 pair width = the HBM bound

Usage: python scripts/step_microbench.py [plan] [step_ids...]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import os  # noqa: E402
os.environ.setdefault("ARTENSOR_TPU_CACHE", os.path.abspath(".jax_cache"))
from artensor_tpu.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

REF_CIRCUIT = "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py"
REF_AMPS = "/root/reference/examples/amplitudes_n30_m14_s0_e0_pEFGH_10000.txt"
R = 30


def build_steps(plan, n_bits=1000):
    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.runtime.sparse import contraction_scheme_sparse

    with open(REF_AMPS) as f:
        bitstrings = [ln.split()[0] for ln in f if ln.strip()][:n_bits]
    n, layers = load_cirq_circuit(REF_CIRCUIT)
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    ntn.simplify("sparse")
    sc = float(plan.rsplit("sc", 1)[1].split(".")[0])
    order, sliced, ctree = plan_io.load_plan(plan)
    steps, _, _ = contraction_scheme_sparse(ctree, bitstrings, sc_target=sc)
    return steps


def timeit(fn, *args):
    import jax
    args = jax.device_put(args)  # keep payloads on device: the tunnel
    # re-uploads numpy args on EVERY call otherwise (~100ms per 32MB)
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.time() - t0) / R


def bench_step(s):
    import jax
    import jax.numpy as jnp

    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime.lowering import _prod, apply_lowered
    import dataclasses

    low = s.lowered
    shape_x = (_prod(low.shape_l if not low.swapped else low.shape_r),)
    shape_w = (_prod(low.shape_r if not low.swapped else low.shape_l),)
    field = make_field(np.complex64, "highest", "split")
    ffield = make_field(np.complex64, "highest", "fused")
    rng = np.random.default_rng(0)

    def mk(shape):
        return (rng.standard_normal(shape, dtype=np.float32),
                rng.standard_normal(shape, dtype=np.float32))

    x, w = mk(shape_x), mk(shape_w)

    def run_many(apply_fn, x, w):
        def body(c, t):
            xs = (x[0] * t, x[1])
            y = apply_fn(xs, w)
            # full sums so XLA cannot scalarize away any of the work
            return c + y[0].sum() + y[1].sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(1, R + 1, dtype=jnp.float32))
        return c

    t_xla = timeit(jax.jit(lambda x, w: run_many(
        lambda xs, ws: apply_lowered(field, xs, ws, low), x, w)), x, w)
    low_nore = dataclasses.replace(low, re_out=None)
    t_nore = timeit(jax.jit(lambda x, w: run_many(
        lambda xs, ws: apply_lowered(field, xs, ws, low_nore), x, w)), x, w)

    # fused: interleaved storage
    xf = field.unwrap(x).ravel()
    wf = field.unwrap(w).ravel()
    xi, wi = ffield.wrap(xf), ffield.wrap(wf)

    def run_many_f(xv, wv):
        def body(c, t):
            y = ffield.contract_step(xv * t, wv, low)
            return c + y.sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(1, R + 1, dtype=jnp.float32))
        return c
    try:
        t_fused = timeit(jax.jit(run_many_f), xi, wi)
    except Exception as e:
        t_fused = float("nan")

    # stream bound: 3 full passes over X per iteration (read x, read+write
    # accumulator) x 2 components
    def run_stream(x):
        def body(c, t):
            return (c[0] + x[0] * t, c[1] + x[1] * t), None
        c, _ = jax.lax.scan(
            body, (jnp.zeros_like(x[0]), jnp.zeros_like(x[1])),
            jnp.arange(1, R + 1, dtype=jnp.float32))
        return c[0].sum() + c[1].sum()
    t_stream = timeit(jax.jit(run_stream),
                      (x[0].reshape(-1), x[1].reshape(-1)))
    return t_xla, t_nore, t_fused, t_stream


def main():
    plan = sys.argv[1] if len(sys.argv) > 1 else "plans/n30_m14_sparse_sc22.json"
    ids = [int(a) for a in sys.argv[2:]] or [93, 99, 105, 114, 118, 127, 133,
                                             140, 148, 91]
    steps = build_steps(plan)
    print(f"{'step':>5s} {'xla':>9s} {'xla-nore':>9s} {'fused':>9s} "
          f"{'stream':>9s}")
    for k in ids:
        s = steps[k]
        if s.lowered is None:
            print(f"{k:5d} chunked — skipped")
            continue
        t = bench_step(s)
        print(f"{k:5d} {t[0] * 1e3:8.3f}ms {t[1] * 1e3:8.3f}ms "
              f"{t[2] * 1e3:8.3f}ms {t[3] * 1e3:8.3f}ms")


if __name__ == "__main__":
    main()
