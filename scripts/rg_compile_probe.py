"""Bisect the RGRow Mosaic compile failure surfaced by proto_rg: run the
row-form kernel standalone on the chip across shape variants (K, Bj
parity, width) and report which compile.

Usage: python -u scripts/rg_compile_probe.py
"""

import sys
import traceback

sys.path.insert(0, ".")

import numpy as np


def try_shape(tag, rx_i, rd_i, rx_j, rd_j, riy, B, bi, bj, width):
    import jax

    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime import gatherk as gk
    from artensor_tpu.runtime.gatherk import apply_ggk_step, plan_ggk_step

    rng = np.random.default_rng(0)
    gi = np.sort(rng.integers(0, bi, B).astype(np.int32))
    gj = rng.integers(0, bj, B).astype(np.int32)
    old_s, old_m = gk.SLACK, gk.GGK_MIN_WORK
    gk.SLACK, gk.GGK_MIN_WORK = 1e9, 1
    try:
        plan = plan_ggk_step(rx_i, rx_j, riy, rd_i, rd_j, gi, gj, bi, bj)
    finally:
        gk.SLACK, gk.GGK_MIN_WORK = old_s, old_m
    if plan is None:
        print(f"{tag}: NO PLAN ({gk.LAST_REJECT})")
        return
    form = "blk" if plan.blk is not None else type(plan.row).__name__
    field = make_field(np.complex64, "highest", "split")
    xi_elems = bi * int(np.prod(rd_i))
    wj_elems = bj * int(np.prod(rd_j))
    x = field.wrap(rng.standard_normal((width, xi_elems))
                   .astype(np.complex64))
    w = field.wrap(rng.standard_normal((width, wj_elems))
                   .astype(np.complex64))

    def f(xr, xi2, wr, wi2):
        return jax.vmap(lambda a, b, c, d: apply_ggk_step(
            field, (a, b), (c, d), plan, interpret=False))(
            xr, xi2, wr, wi2)

    try:
        r = jax.block_until_ready(jax.jit(f)(x[0], x[1], w[0], w[1]))
        print(f"{tag}: OK ({form}) out {np.asarray(r[0]).shape}")
    except Exception as e:
        print(f"{tag}: COMPILE FAIL ({form}) {str(e)[:150]}")


def main():
    riy = ("h", "f0", "f1")
    # proto_rg default class, K = 4096
    try_shape("K4096 b512", ("k0", "k1", "f0", "k2", "f1"),
              (2, 4, 2, 512, 4), ("k0", "k1", "k2", "h"), (2, 4, 512, 2),
              riy, 1008, 512, 512, 8)
    # bench step-173 class, K = 2048 (known good via bench)
    try_shape("K2048 b512", ("k0", "k1", "f0", "k2", "f1"),
              (2, 4, 2, 256, 4), ("k0", "k1", "k2", "h"), (2, 4, 256, 2),
              riy, 1008, 512, 512, 8)
    # K = 4096, odd bj
    try_shape("K4096 bj999", ("k0", "k1", "f0", "k2", "f1"),
              (2, 4, 2, 512, 4), ("k0", "k1", "k2", "h"), (2, 4, 512, 2),
              riy, 1000, 251, 999, 8)


if __name__ == "__main__":
    main()
