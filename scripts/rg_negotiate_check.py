"""Est-level validation of RGRow producer-order negotiation.

Compiles the committed headline plans (scheme cache: the source-keyed
memo means edits to sparse/negotiate/gatherk recompile honestly) and
reports, per scheme: calibrated wall estimate, kernel census, and how
many RGRow steps reached the negotiated goal state (identity wk take /
no canonical pre-reorder).

Run: python scripts/rg_negotiate_check.py [plan ...]
"""

import re
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import REF_AMPLITUDES, _load_n30
from artensor_tpu import plan_io
from artensor_tpu.runtime import gatherk
from artensor_tpu.runtime.metrics import scheme_wall_estimate
from artensor_tpu.runtime.scheme_cache import cached_scheme_sparse

PLANS = sys.argv[1:] or ["plans/n30_m14_sparse_sc22_r2.json",
                         "plans/n30_m14_sparse_sc22.json"]
N_BITS = {"plans/n30_m14_sparse_sc22_r2.json": 1000,
          "plans/n30_m14_sparse_sc22.json": 10000}

gt = []
with open(REF_AMPLITUDES) as f:
    for line in f:
        p = line.split()
        if len(p) == 3:
            gt.append(p[0])

ntn = _load_n30()
ntn.simplify("sparse")

for plan in PLANS:
    n_bits = N_BITS.get(plan, 1000)
    bitstrings = gt[:n_bits]
    order, sliced, ctree = plan_io.load_plan(plan)
    m = re.search(r"sc(\d+)", plan)
    sc_t = float(m.group(1)) if m else 22.0
    t0 = time.time()
    steps, out_bonds, bits_sorted = cached_scheme_sparse(
        plan, ctree, bitstrings, sc_target=sc_t)
    dt = time.time() - t0
    est, w, comp = scheme_wall_estimate(steps, 0)
    census = {}
    rg_total = rg_ident = rg_noperm = 0
    for s in steps:
        if s.lane is None:
            continue
        name = type(s.lane).__name__
        row = getattr(s.lane, "row", None)
        if row is not None:
            name += "/" + type(row).__name__
            if isinstance(row, gatherk.RGRow):
                rg_total += 1
                if np.array_equal(row.wk_idx.ravel(),
                                  np.arange(row.wk_idx.size)):
                    rg_ident += 1
                if row.pre_perm is None:
                    rg_noperm += 1
        census[name] = census.get(name, 0) + 1
    print(f"{plan} [{n_bits} bits] compile {dt:.1f}s")
    print(f"  est {est * 1000:.2f} ms/slice @ width {w}; "
          f"steps {len(steps)}, kernels {sum(census.values())}")
    print(f"  census {census}")
    print(f"  RGRow steps {rg_total}: wk-identity {rg_ident}, "
          f"no-pre-reorder {rg_noperm}")
