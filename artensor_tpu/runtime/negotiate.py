"""Producer-layout negotiation: bounded best-first search over override
sets, shared by the sparse and dense scheme compilers.

Pass 1 compiles with time-ordered layouts; wherever the pre-permuted
gather-K form fired (an explicit transpose of X before the kernel,
measured as TWO full HBM passes: XLA retile+layout copy plus a
normalize copy — docs/BENCH_NOTES.md round-3 profile), pass 2 asks X's
PRODUCER to emit that order directly, making the transpose unnecessary.

Two kinds of moves: a strict win (the consumer's pre-transpose
disappears and nobody pays) and a WASH (the transpose relocates onto
the producer, estimate unchanged) — washes are explored because the
relocated pre issues a NEW request one link up the chain, and the chain
often terminates at a producer flexible enough to absorb the order for
free (the whole chain of transposes then collapses to the absorption
point).

Hard guard everywhere: no step that had a kernel in pass 1 may lose it
— the estimate model undervalues real kernel speedups (measured:
trading 2 hot kernels for 5 removed pre-transposes ran 1.45 -> 1.55s).
Only a strictly-better final state is committed.
"""


def negotiate(compile_fn, max_trials=40):
    """Run the override search.

    ``compile_fn(overrides_or_None)`` must return
    ``(result, steps, requests)`` where ``result`` is whatever the
    caller wants back, ``steps`` carry ``.lane`` attributes, and
    ``requests`` maps producer step index -> tuple of candidate output
    bond orders (friendliest first).  Returns the best ``result`` by
    the calibrated wall estimate.
    """
    from .metrics import scheme_wall_estimate

    res1, steps1, requests = compile_fn(None)
    if not requests:
        return res1
    est1 = scheme_wall_estimate(steps1, 0)[0]
    eps = est1 * 1e-6
    kern1 = [s.lane is not None for s in steps1]
    best, best_est = res1, est1
    seen = {frozenset()}
    frontier = [(est1, 0, {}, requests)]
    trials = 0
    while frontier and trials < max_trials:
        frontier.sort(key=lambda f: (f[0], len(f[2])))
        est, _, acc, pend = frontier.pop(0)
        for t_req, cands in pend.items():
            if t_req in acc:
                continue
            for want in cands:
                trial = dict(acc)
                trial[t_req] = want
                key = frozenset(trial.items())
                if key in seen:
                    continue
                seen.add(key)
                trials += 1
                res2, steps2, req2 = compile_fn(trial)
                if any(k and s.lane is None
                       for k, s in zip(kern1, steps2)):
                    continue
                est2 = scheme_wall_estimate(steps2, 0)[0]
                if est2 > est + eps:
                    continue
                merged = dict(pend)
                merged.update(req2)
                frontier.append((est2, trials, trial, merged))
                if est2 < best_est - eps:
                    best = res2
                    best_est = est2
                if est2 < est - eps:
                    break       # strict win at this node: stop scanning
                                # weaker candidates (washes stay queued)
    return best
