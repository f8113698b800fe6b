"""Prototype: Pallas fused split-complex step kernel for one hot n30 step.

Step shape (step96 of the sc22 scheme): big operand X logical
(8,2,2,4096,2,2,8) with contract legs (b,c,e,f) interleaved, small operand
W with K=16, N=16; vmap width V emulates slice batching.

Three execution paths measured:
  xla   — the production apply_lowered multi-dim dot_general 4-dot chain
  pallas— fused kernel: in-kernel transpose to (M1, m2*K) and ONE
          (M1,128)x(128,2N*m2) block-diagonal dot per component, re/im
          combined in VMEM (operands read once, no relayouts)

Run on CPU (interpret+correctness): JAX_PLATFORMS=cpu python scripts/proto_step_kernel.py check
Run on TPU (timing):                python scripts/proto_step_kernel.py time
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROTO_CPU"):   # axon plugin beats JAX_PLATFORMS env var
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

V = int(os.environ.get("PROTO_V", "16"))   # emulated slice-vmap width
DIMS_X = (8, 2, 2, 4096, 2, 2, 8)   # labels a b c d e f g
CONTRACT = (1, 2, 4, 5)             # b c e f  (K = 16)
N_OUT = 16                          # rhs free size
M2 = 8                              # g packed into MXU K dim (trailing free run)


def make_operands(key):
    kx, kw = jax.random.split(key)
    xre = jax.random.normal(kx, (V,) + DIMS_X, jnp.float32)
    xim = jax.random.normal(jax.random.split(kx)[0], (V,) + DIMS_X, jnp.float32)
    wre = jax.random.normal(kw, (16, N_OUT), jnp.float32)   # (K, N) canonical
    wim = jax.random.normal(jax.random.split(kw)[0], (16, N_OUT), jnp.float32)
    return xre, xim, wre, wim


def reference(xre, xim, wre, wim):
    """einsum oracle: contract (b,c,e,f) with W[(b,c,e,f),n] -> (v,a,d,g,n)."""
    x = xre + 1j * xim
    w = (wre + 1j * wim).reshape(2, 2, 2, 2, N_OUT)
    y = jnp.einsum("vabcdefg,bcefn->vadgn", x, w)
    return np.asarray(y.real), np.asarray(y.imag)


# -- pallas path ----------------------------------------------------------

def _kernel(xre_ref, xim_ref, wp_ref, yre_ref, yim_ref):
    # x block: (1, 1, 4, 4096, 32) — (b*c, d, e*f*g); contract legs b,c
    # sliced statically, e,f ride in the 32-lane K dim with g preserved via
    # the block-diagonal wp.  wp cols: [:128] re-products, [128:] im-products
    # (both laid out g*N+n), so the re/im combine is tile-aligned lane
    # slicing — no in-kernel shape casts.
    dot = functools.partial(jnp.dot, precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    tr = None
    ti = None
    for bc in range(4):
        vr = xre_ref[0, 0, bc]                        # (1024, 32)
        vi = xim_ref[0, 0, bc]
        wbc = wp_ref[bc]                              # (32, 256)
        tr = dot(vr, wbc) if tr is None else tr + dot(vr, wbc)
        ti = dot(vi, wbc) if ti is None else ti + dot(vi, wbc)
    H = M2 * N_OUT
    yre_ref[0, 0] = tr[:, :H] - ti[:, H:]
    yim_ref[0, 0] = tr[:, H:] + ti[:, :H]


def build_wp(wre, wim):
    """(4, 32, 2*M2*N): per (b,c) rows (e*16+f*8+g); cols [re | im] halves,
    each (g*N + n) block-diagonal in g."""
    wr4 = np.asarray(wre).reshape(2, 2, 2, 2, N_OUT)
    wi4 = np.asarray(wim).reshape(2, 2, 2, 2, N_OUT)
    H = M2 * N_OUT
    wp = np.zeros((4, 2 * 2 * M2, 2 * H), np.float32)
    for bc in range(4):
        b, cc = bc >> 1, bc & 1
        for e in range(2):
            for f in range(2):
                for g in range(M2):
                    row = e * 2 * M2 + f * M2 + g
                    wp[bc, row, g * N_OUT:(g + 1) * N_OUT] = wr4[b, cc, e, f]
                    wp[bc, row, H + g * N_OUT:H + (g + 1) * N_OUT] = wi4[b, cc, e, f]
    return jnp.asarray(wp)


def pallas_step(xre, xim, wp, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (V, 8, 4)
    xre = xre.reshape(V, 8, 4, 4096, 32)
    xim = xim.reshape(V, 8, 4, 4096, 32)
    xspec = pl.BlockSpec((1, 1, 4, 1024, 32),
                         lambda v, a, d: (v, a, 0, d, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((4, 2 * 2 * M2, 2 * M2 * N_OUT),
                         lambda v, a, d: (0, 0, 0), memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((1, 1, 1024, M2 * N_OUT),
                         lambda v, a, d: (v, a, d, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((V, 8, 4096, M2 * N_OUT), jnp.float32)
    return pl.pallas_call(
        _kernel, grid=grid,
        in_specs=[xspec, xspec, wspec],
        out_specs=(yspec, yspec),
        out_shape=(out_shape, out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * V * 8 * 4096 * 128 * M2 * 2 * N_OUT,
            bytes_accessed=4 * (2 * xre.size + 2 * out_shape.size),
            transcendentals=0),
        interpret=interpret,
    )(xre, xim, wp)


# -- xla production path --------------------------------------------------

def xla_step(xre, xim, wre, wim):
    from artensor_tpu.runtime.lowering import lower_step, apply_lowered
    from artensor_tpu.ops.field import SplitField

    ix_l = ("a", "b", "c", "d", "e", "f", "g")
    ix_r = ("b", "c", "e", "f", "n1", "n2")
    iy = ("a", "d", "g", "n1", "n2")
    low = lower_step(ix_l, ix_r, iy, DIMS_X, (2, 2, 2, 2, 4, 4))
    field = SplitField()

    def one(xr, xi):
        x = (xr.reshape(8, -1), xi.reshape(8, -1))
        w = (wre.reshape(2, 2, 2, 2, 4, 4), wim.reshape(2, 2, 2, 2, 4, 4))
        w = (w[0].reshape(2, -1), w[1].reshape(2, -1))
        return apply_lowered(field, x, w, low)

    return jax.vmap(one)(xre, xim)


def bench(fn, xre, xim, *extra, reps=10):
    """Time `reps` dependent invocations inside ONE jitted scan (per-call
    dispatch latency through the tunnel is ~100ms, so single calls cannot
    be timed directly)."""
    def many(xr, xi):
        def body(carry, _):
            cr, ci = carry
            out = fn(cr, ci, *extra)
            leaf = jax.tree.leaves(out)[0]
            return (cr * 1.000001, ci * 1.000001), leaf.ravel()[0]
        _, ys = lax.scan(body, (xr, xi), None, length=reps)
        return ys
    j = jax.jit(many)
    ys = j(xre, xim)
    _ = np.asarray(ys)
    t0 = time.time()
    ys = j(xre, xim)
    _ = np.asarray(ys)
    return (time.time() - t0) / reps, None


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    key = jax.random.PRNGKey(0)
    xre, xim, wre, wim = make_operands(key)
    wp = build_wp(wre, wim)

    if mode == "check":
        yre, yim = reference(xre, xim, wre, wim)
        pre, pim = pallas_step(xre, xim, wp, interpret=True)
        pre = np.asarray(pre).reshape(V, 8, 4096, M2, N_OUT).transpose(0, 1, 2, 3, 4)
        # produced layout (v, a, d, g*n): logical (v,a,d,g,n)
        pre_l = np.asarray(pre).reshape(V, 8, 4096, M2, N_OUT)
        pim_l = np.asarray(pim).reshape(V, 8, 4096, M2, N_OUT)
        print("pallas max err:", np.abs(pre_l - yre).max(), np.abs(pim_l - yim).max())
        xr, xi2 = xla_step(xre, xim, wre, wim)
        xr_l = np.asarray(xr).reshape(V, 8, 4096, M2, N_OUT)
        xi_l = np.asarray(xi2).reshape(V, 8, 4096, M2, N_OUT)
        print("xla max err:", np.abs(xr_l - yre).max(), np.abs(xi_l - yim).max())
        return

    t_pal, _ = bench(lambda a, b, c: pallas_step(a, b, c), xre, xim, wp)
    t_xla, _ = bench(xla_step, xre, xim, wre, wim)
    t_null, _ = bench(lambda a, b: ((a + b)[:1, :1],), xre, xim)
    print(f"carry-only {t_null*1e3:.2f} ms")
    t_pal -= t_null
    t_xla -= t_null
    bytes_min = 4 * (2 * xre.size * 2 + 2 * xre.size // 16 * 16 * 2)
    elems = V * np.prod(DIMS_X)
    traffic = 4 * 2 * (elems + elems)  # read X(re+im) + write Y(re+im)
    print(f"pallas {t_pal*1e3:.2f} ms  ({traffic/t_pal/1e9:.0f} GB/s eff)")
    print(f"xla    {t_xla*1e3:.2f} ms  ({traffic/t_xla/1e9:.0f} GB/s eff)")


if __name__ == "__main__":
    main()
