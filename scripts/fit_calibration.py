"""Fit the wall-estimate calibration from width-sweep records.

Model (runtime/metrics.py scheme_wall_estimate):

    wall = 2^k * ( kern_factor * kern_s
                 + xla_factor  * xla_s
                 + byte_factor * bytes_per_slice / HBM_RATE
                 + n_steps * step_overhead_w1_s / width )

The four factors are fitted by least squares over every (scheme, width,
wall) point recorded by ``scripts/width_sweep.py --record=FILE``.  The
byte term is the regressor for the measured size-proportional gap
(docs/BENCH_NOTES.md: 1.6x at width 128 vs 3.9x at width 16) that the
base model misses; with identity factors the model reproduces the
uncalibrated estimate exactly.

Needs records from at least two schemes with different per-slice sizes
to separate the byte term from the kernel term (sc22 + sc25 sweeps).

Usage:
    python scripts/fit_calibration.py sweep_sc22.json sweep_sc25.json \
        [--write]            # --write saves artensor_tpu/calibration.json
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from artensor_tpu.planner.cost import (STEP_OVERHEAD_W1_S,  # noqa: E402
                                       TPU_HBM_BYTES_PER_S)

OUT = os.path.join(os.path.dirname(__file__), "..", "artensor_tpu",
                   "calibration.json")


def main():
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    write = "--write" in sys.argv
    minw = 32
    for a in sys.argv[1:]:
        if a.startswith("--minwidth="):
            minw = int(a.split("=", 1)[1])
    rows, y, tags = [], [], []
    schemes = set()
    for p in paths:
        with open(p) as f:
            r = json.load(f)
        n_slices = 2.0 ** r["k"]
        schemes.add((round(r["kern_s"], 9), round(r["bytes_per_slice"], 3)))
        for pt in r["points"]:
            rows.append([n_slices * r["kern_s"],
                         n_slices * r["xla_s"],
                         n_slices * r["bytes_per_slice"]
                         / TPU_HBM_BYTES_PER_S,
                         n_slices * r["n_steps"] / pt["width"],
                         pt["width"]])
            y.append(pt["wall_s"])
            tags.append((os.path.basename(p), pt["width"]))
    X = np.array(rows)
    y = np.array(y)
    if len(y) < 4 or len(schemes) < 2:
        print(f"need >=4 points across >=2 schemes "
              f"(have {len(y)} points, {len(schemes)} schemes)")
        sys.exit(1)
    # Physical model: the kernel and XLA step costs are trusted at 1x
    # (they are built from measured rates), and the two terms the base
    # model misses are fitted: a size-proportional byte factor (extra
    # HBM passes proportional to how much data the scheme moves) and the
    # per-step fixed overhead.  Fit on the OPERATING regime only
    # (width >= --minwidth, default 32): narrow widths have chunk-launch
    # effects the linear model cannot carry, and plans never run there
    # (round-4 fit: byte 0.42, overhead 238us, every w>=32 point within
    # 15%; freeing kern_factor drove it to an unphysical ~0).
    sel = X[:, 4] >= minw
    Xf = X[sel][:, :4]
    theta, *_ = np.linalg.lstsq(Xf[:, 2:], y[sel] - Xf[:, 0] - Xf[:, 1],
                                rcond=None)
    theta = np.maximum(theta, 0.0)       # physical: no negative costs
    full = np.array([1.0, 1.0, theta[0], theta[1]])
    pred = X[:, :4] @ full
    cal = {"kern_factor": round(float(full[0]), 4),
           "xla_factor": round(float(full[1]), 4),
           "byte_factor": round(float(full[2]), 4),
           "step_overhead_w1_s": round(float(full[3]), 8)}
    print(json.dumps(cal, indent=1))
    print(f"(uncalibrated: kern=1 xla=1 byte=0 "
          f"overhead={STEP_OVERHEAD_W1_S})")
    for (tag, w), yi, pi in zip(tags, y, pred):
        print(f"  {tag} w{w:<4} wall={yi:6.3f}s fit={pi:6.3f}s "
              f"({pi / yi:5.2f}x)")
    rms = float(np.sqrt(np.mean((pred - y) ** 2)))
    rms_op = float(np.sqrt(np.mean((pred[sel] - y[sel]) ** 2)))
    print(f"rms residual {rms:.3f}s over {len(y)} points "
          f"({rms_op:.3f}s over the {int(sel.sum())} fitted w>={minw})")
    if write:
        with open(OUT, "w") as f:
            json.dump(cal, f, indent=1)
        print(f"wrote {os.path.normpath(OUT)}")
    else:
        print("(dry run: pass --write to save)")


if __name__ == "__main__":
    main()
