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
                         n_slices * r["n_steps"] / pt["width"]])
            y.append(pt["wall_s"])
            tags.append((os.path.basename(p), pt["width"]))
    X = np.array(rows)
    y = np.array(y)
    if len(y) < 4 or len(schemes) < 2:
        print(f"need >=4 points across >=2 schemes "
              f"(have {len(y)} points, {len(schemes)} schemes)")
        sys.exit(1)
    # Each scheme contributes ONE independent intercept (per-slice cost)
    # plus the shared 1/width slope, so at most (#schemes - 1) + 1 of the
    # three per-slice factors are identifiable beyond the fixed xla=1:
    # fit (byte_factor, overhead) by default — the byte term IS the
    # hypothesized missing cost — and free kern_factor only when a third
    # scheme pins it.
    free_kern = len(schemes) >= 3
    cols = ([0] if free_kern else []) + [2, 3]
    rhs = y - X[:, 1] - (0 if free_kern else X[:, 0])
    theta, *_ = np.linalg.lstsq(X[:, cols], rhs, rcond=None)
    theta = np.maximum(theta, 0.0)       # physical: no negative costs
    full = np.array([theta[0] if free_kern else 1.0, 1.0,
                     theta[-2], theta[-1]])
    pred = X @ full
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
    print(f"rms residual {rms:.3f}s over {len(y)} points")
    if write:
        with open(OUT, "w") as f:
            json.dump(cal, f, indent=1)
        print(f"wrote {os.path.normpath(OUT)}")
    else:
        print("(dry run: pass --write to save)")


if __name__ == "__main__":
    main()
