"""Probe the RGRow producer-request path on the 1k headline scheme:
compile pass 1, dump the request set, then apply each RGRow-motivated
request alone and report est / kernel effects."""

import re
import sys

sys.path.insert(0, ".")

import numpy as np

from bench import REF_AMPLITUDES, _load_n30
from artensor_tpu import plan_io
from artensor_tpu.runtime import gatherk
from artensor_tpu.runtime.metrics import scheme_wall_estimate
from artensor_tpu.runtime.sparse import _compile_sparse

plan = sys.argv[1] if len(sys.argv) > 1 else \
    "plans/n30_m14_sparse_sc22_r2.json"
n_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

gt = []
with open(REF_AMPLITUDES) as f:
    for line in f:
        p = line.split()
        if len(p) == 3:
            gt.append(p[0])
bitstrings = gt[:n_bits]

ntn = _load_n30()
ntn.simplify("sparse")
order, sliced, ctree = plan_io.load_plan(plan)
sc_t = float(re.search(r"sc(\d+)", plan).group(1))

memo = {}


def compile_fn(overrides):
    steps, ob, bits, req = _compile_sparse(
        ctree, bitstrings, sc_t, True, overrides, None, _memo=memo)
    return steps, req


steps1, req1 = compile_fn(None)
est1 = scheme_wall_estimate(steps1, 0)[0]
print(f"pass1 est {est1*1000:.3f} ms, {len(req1)} requests")
rg_steps = [k for k, s in enumerate(steps1)
            if s.lane is not None
            and isinstance(getattr(s.lane, "row", None), gatherk.RGRow)]
print(f"RGRow steps: {rg_steps}")
for k in rg_steps:
    row = steps1[k].lane.row
    ident = bool(np.array_equal(row.wk_idx.ravel(),
                                np.arange(row.wk_idx.size)))
    print(f"  step {k}: wk_ident={ident} pre_perm={row.pre_perm} "
          f"px={row.px} wx={row.wx} K={row.K} H={row.H} "
          f"view_x={row.view_x}")

for t_req, cands in sorted(req1.items()):
    for want in cands:
        steps2, req2 = compile_fn({t_req: want})
        est2 = scheme_wall_estimate(steps2, 0)[0]
        lost = any(s1.lane is not None and s2.lane is None
                   for s1, s2 in zip(steps1, steps2))
        rg2 = [(k, bool(np.array_equal(
            steps2[k].lane.row.wk_idx.ravel(),
            np.arange(steps2[k].lane.row.wk_idx.size)))
            if steps2[k].lane is not None
            and isinstance(getattr(steps2[k].lane, "row", None),
                           gatherk.RGRow) else None)
            for k in rg_steps]
        print(f"req step {t_req} -> {want}: est {est2*1000:.3f} ms "
              f"(d {1000*(est2-est1):+.3f}), lost_kernel={lost}, "
              f"rg_ident={rg2}")
