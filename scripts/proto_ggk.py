"""Prototype: gathered gather-K (GGK) kernel for ALIGNED sparse steps.

Aligned-step form (runtime/sparse.py, both sides batched, cross too big):

    Y[b, h, f] = sum_k  X[gi[b], k, f] * W[gj[b], k, h]      b = 0..B-1

The XLA path materializes gathered row copies (take: write+read), runs an
MXU-pad-hostile batch-diagonal dot (each row a tiny (K,F)x(K,H) problem),
chunks when batch x operand exceeds the memory budget, and concats the
chunk outputs — measured ~4x its fused-minimum traffic and the source of
two OOM classes (padded batch-dot layouts, padded chunk copies).

The kernel: grid over rows; per program the X/W blocks are DMA'd straight
from the SOURCE rows via scalar-prefetched gather indices feeding the
BlockSpec index maps — no gathered copy exists, no chunking is needed, and
the dot runs w4-packed (all four re/im products in one MXU pass).

Under the slice vmap the row program carries the whole width as a leading
block axis (one DMA of w rows per operand), so per-program traffic is
width x row bytes and the ~0.9us program cost amortizes.

Run: JAX_PLATFORMS=cpu python scripts/proto_ggk.py   (interpret oracle)
     python scripts/proto_ggk.py [B K F H width]     (chip perf A/B)
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def make_ggk(Bi, Bj, B, K, F, H, width=0, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fm = 128
    assert F % fm == 0
    bf = F // fm
    nb = 1 if width else 0

    def kernel(gi_ref, gj_ref, xr_ref, xi_ref, wr_ref, wi_ref,
               or_ref, oi_ref):
        # blocks: x (w?, 1, K, bf, fm)  w (w?, 1, H, K)  y (w?, 1, H, bf, fm)
        xr = xr_ref[...].reshape((-1, K, bf, fm))
        xi = xi_ref[...].reshape((-1, K, bf, fm))
        wr = wr_ref[...].reshape((-1, H, K))
        wi = wi_ref[...].reshape((-1, H, K))
        W = xr.shape[0]
        dotf = partial(lax.dot_general,
                       dimension_numbers=(((1,), (0,)), ((), ())),
                       precision=lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        for s in range(W):
            w4 = jnp.concatenate(
                [jnp.concatenate([wr[s], -wi[s]], axis=1),
                 jnp.concatenate([wi[s], wr[s]], axis=1)], axis=0)
            xc = jnp.concatenate([xr[s], xi[s]], axis=0)  # (2K, bf, fm)
            for fi in range(bf):
                o = dotf(w4, xc[:, fi])                   # (2H, fm)
                idx = (s, 0, slice(None), fi, slice(None)) if nb \
                    else (0, slice(None), fi, slice(None))
                or_ref[idx] = o[:H]
                oi_ref[idx] = o[H:]

    def x_index(b, fi, gi, gj):
        return (0, gi[b], 0, 0, 0) if nb else (gi[b], 0, 0, 0)

    def w_index(b, fi, gi, gj):
        return (0, gj[b], 0, 0) if nb else (gj[b], 0, 0)

    def y_index(b, fi, gi, gj):
        return (0, b, 0, fi, 0) if nb else (b, 0, fi, 0)

    if nb:
        xspec = pl.BlockSpec((width, 1, K, bf, fm), x_index,
                             memory_space=pltpu.VMEM)
        wspec = pl.BlockSpec((width, 1, H, K), w_index,
                             memory_space=pltpu.VMEM)
        yspec = pl.BlockSpec((width, 1, H, bf, fm), y_index,
                             memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((width, B, H, bf, fm), jnp.float32)
    else:
        xspec = pl.BlockSpec((1, K, bf, fm), x_index,
                             memory_space=pltpu.VMEM)
        wspec = pl.BlockSpec((1, H, K), w_index, memory_space=pltpu.VMEM)
        yspec = pl.BlockSpec((1, H, bf, fm), y_index,
                             memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, H, bf, fm), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, 1),
        in_specs=[xspec, xspec, wspec, wspec],
        out_specs=(yspec, yspec),
    )

    def run(gi, gj, xr, xi, wr, wi):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(out_shape, out_shape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(gi, gj, xr, xi, wr, wi)

    return run


def xla_aligned(gi, gj, xr, xi, wr, wi):
    """Reference XLA path: take + batch-diagonal einsum (bkf,bhk->bhf)."""
    import jax.numpy as jnp

    xgr, xgi_ = jnp.take(xr, gi, axis=-4), jnp.take(xi, gi, axis=-4)
    wgr, wgi = jnp.take(wr, gj, axis=-3), jnp.take(wi, gj, axis=-3)
    eq = "...bkuf,...bhk->...bhuf"
    from jax import lax
    mm = partial(jnp.einsum, eq, precision=lax.Precision.HIGHEST)
    return (mm(xgr, wgr) - mm(xgi_, wgi), mm(xgr, wgi) + mm(xgi_, wgr))


def main():
    import jax
    import jax.numpy as jnp

    args = [int(a) for a in sys.argv[1:]]
    B, K, F, H = (args + [2000, 128, 4096, 16][len(args):])[:4]
    width = args[4] if len(args) > 4 else 0
    Bi = Bj = max(256, B // 2)
    fm = 128
    bf = F // fm
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    gi = rng.integers(0, Bi, B).astype(np.int32)
    gj = rng.integers(0, Bj, B).astype(np.int32)
    gi.sort()
    shape_x = (width, Bi, K, bf, fm) if width else (Bi, K, bf, fm)
    shape_w = (width, Bj, H, K) if width else (Bj, H, K)
    xr = rng.standard_normal(shape_x, dtype=np.float32)
    xi = rng.standard_normal(shape_x, dtype=np.float32)
    wr = rng.standard_normal(shape_w, dtype=np.float32)
    wi = rng.standard_normal(shape_w, dtype=np.float32)

    run = make_ggk(Bi, Bj, B, K, F, H, width, interpret=not on_tpu)
    run_j = jax.jit(run)
    if on_tpu:   # keep operands resident; numpy args re-upload per call
        gi, gj, xr, xi, wr, wi = jax.device_put((gi, gj, xr, xi, wr, wi))
    yr, yi = jax.block_until_ready(run_j(gi, gj, xr, xi, wr, wi))

    # oracle
    ref_r, ref_i = xla_aligned(jnp.asarray(gi), jnp.asarray(gj),
                               jnp.asarray(xr), jnp.asarray(xi),
                               jnp.asarray(wr), jnp.asarray(wi))
    err = max(float(jnp.abs(yr - ref_r).max()),
              float(jnp.abs(yi - ref_i).max()))
    print(f"B={B} K={K} F={F} H={H} width={width} max abs err {err:.2e}")
    assert err < 1e-3 * K ** 0.5

    if not on_tpu:
        print("CPU interpret oracle PASS")
        return

    # the axon tunnel has a ~58 ms round-trip floor: time 16 chained
    # iterations inside ONE jit (dependency through the gather indices —
    # a few bytes — so nothing is CSE'd and no extra data passes occur)
    def scan16(base):
        def wrapped(gi, gj, xr, xi, wr, wi):
            def body(c, _):
                yr, yi = base(gi + c, gj, xr, xi, wr, wi)
                return (yr.ravel()[0] * 0).astype(jnp.int32), None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=16)
            return c
        return jax.jit(wrapped)

    for tag, base in [("ggk", run), ("xla", xla_aligned)]:
        f = scan16(base)
        r = jax.block_until_ready(f(gi, gj, xr, xi, wr, wi))
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = jax.block_until_ready(f(gi, gj, xr, xi, wr, wi))
            _ = np.asarray(r)
            ts.append(time.time() - t0)
        w = max(1, width)
        bytes_ = 4 * 2 * w * B * (K * F + K * H + H * F)
        t = float(np.median(ts)) / 16
        print(f"{tag}: {t*1e3:.2f} ms  ({bytes_/t/1e9:.0f} GB/s-equiv "
              f"fused-min traffic)")


if __name__ == "__main__":
    main()
