"""Prototype B: lane-scheduled fused step — contract legs pre-packed in lanes.

Simulates the lane-scheduled executor's storage: X stored (V, a, d, L=128)
with lanes = (b, c, e, f, g) [4 contract legs + g free for block-diag].
One K=128 full-MXU dot per component per block; re/im combined in VMEM.

Expected: traffic-bound (~2ms for V=16) instead of MXU-K-bound (12.7ms).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROTO_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

V = int(os.environ.get("PROTO_V", "16"))
N_OUT = 16
M2 = 8


def make_operands(key):
    kx, kw = jax.random.split(key)
    # lane-scheduled storage: (V, a=8, d=4096, L=128) lanes=(b,c,e,f,g)
    xre = jax.random.normal(kx, (V, 8, 4096, 128), jnp.float32)
    xim = jax.random.normal(jax.random.split(kx)[0], (V, 8, 4096, 128), jnp.float32)
    wre = jax.random.normal(kw, (16, N_OUT), jnp.float32)
    wim = jax.random.normal(jax.random.split(kw)[0], (16, N_OUT), jnp.float32)
    return xre, xim, wre, wim


def build_wp(wre, wim):
    """(128, 256): rows (b,c,e,f,g); cols [re|im] halves each (g*N+n)."""
    wr = np.asarray(wre).reshape(2, 2, 2, 2, N_OUT)
    wi = np.asarray(wim).reshape(2, 2, 2, 2, N_OUT)
    H = M2 * N_OUT
    wp = np.zeros((128, 2 * H), np.float32)
    for b in range(2):
        for c in range(2):
            for e in range(2):
                for f in range(2):
                    for g in range(M2):
                        row = (((b * 2 + c) * 2 + e) * 2 + f) * M2 + g
                        wp[row, g * N_OUT:(g + 1) * N_OUT] = wr[b, c, e, f]
                        wp[row, H + g * N_OUT:H + (g + 1) * N_OUT] = wi[b, c, e, f]
    return jnp.asarray(wp)


def reference(xre, xim, wre, wim):
    x = (xre + 1j * xim).reshape(V, 8, 4096, 2, 2, 2, 2, M2)
    w = (wre + 1j * wim).reshape(2, 2, 2, 2, N_OUT)
    y = jnp.einsum("vadbcefg,bcefn->vadgn", x, w)
    return np.asarray(y.real), np.asarray(y.imag)


def _kernel(xre_ref, xim_ref, wp_ref, yre_ref, yim_ref):
    dot = functools.partial(jnp.dot, precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    wp = wp_ref[:]
    tr = dot(xre_ref[0, 0], wp)     # (1024, 256)
    ti = dot(xim_ref[0, 0], wp)
    H = M2 * N_OUT
    yre_ref[0, 0] = tr[:, :H] - ti[:, H:]
    yim_ref[0, 0] = tr[:, H:] + ti[:, :H]


def pallas_step(xre, xim, wp):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (V, 8, 4)
    xspec = pl.BlockSpec((1, 1, 1024, 128), lambda v, a, d: (v, a, d, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((128, 256), lambda v, a, d: (0, 0),
                         memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((1, 1, 1024, 128), lambda v, a, d: (v, a, d, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((V, 8, 4096, 128), jnp.float32)
    return pl.pallas_call(
        _kernel, grid=grid,
        in_specs=[xspec, xspec, wspec],
        out_specs=(yspec, yspec),
        out_shape=(out_shape, out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * V * 8 * 4096 * 128 * 256,
            bytes_accessed=4 * (2 * xre.size + 2 * out_shape.size),
            transcendentals=0),
    )(xre, xim, wp)


def bench(fn, xre, xim, *extra, reps=10):
    def many(xr, xi):
        def body(carry, _):
            cr, ci = carry
            out = fn(cr, ci, *extra)
            leaf = jax.tree.leaves(out)[0]
            return (cr * 1.000001, ci * 1.000001), leaf.ravel()[0]
        _, ys = lax.scan(body, (xr, xi), None, length=reps)
        return ys
    j = jax.jit(many)
    _ = np.asarray(j(xre, xim))
    t0 = time.time()
    _ = np.asarray(j(xre, xim))
    return (time.time() - t0) / reps


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    key = jax.random.PRNGKey(0)
    xre, xim, wre, wim = make_operands(key)
    wp = build_wp(wre, wim)

    if mode == "check":
        yre, yim = reference(xre, xim, wre, wim)
        def run(a, b, c):
            from jax.experimental import pallas as pl
            return pallas_step(a, b, c)
        # interpret via force mode
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            pre, pim = pallas_step(xre, xim, wp)
        pre_l = np.asarray(pre).reshape(V, 8, 4096, M2, N_OUT)
        pim_l = np.asarray(pim).reshape(V, 8, 4096, M2, N_OUT)
        print("lane-pallas max err:", np.abs(pre_l - yre).max(),
              np.abs(pim_l - yim).max())
        return

    t_pal = bench(pallas_step, xre, xim, wp)
    t_null = bench(lambda a, b: ((a + b)[:1, :1],), xre, xim)
    elems = V * 8 * 4096 * 128
    traffic = 4 * 2 * (elems + elems)
    t = t_pal - t_null
    print(f"carry-only {t_null*1e3:.2f} ms")
    print(f"lane-pallas {t*1e3:.2f} ms  ({traffic/t/1e9:.0f} GB/s eff)")


if __name__ == "__main__":
    main()
