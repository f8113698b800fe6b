"""Two-process jax.distributed test: slice ranges split across processes.

Each subprocess gets 4 virtual CPU devices; the global mesh spans 8 devices
over 2 processes (SURVEY §2.9's DCN-across-pods analogue, scaled down).
Process 0 writes its replicated result to a file; the parent compares it
against the single-process reference.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from artensor_tpu.parallel import distributed as dist
    dist.initialize()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    from artensor_tpu.circuits import TensorNetworkCircuit
    from artensor_tpu.circuits.random_circuits import random_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.planner import find_order
    from artensor_tpu.runtime.executor import build_slicing_axes, stage_tensors
    from artensor_tpu.runtime.sparse import (
        contraction_scheme_sparse, execute_sparse)

    n, layers = random_circuit(3, 3, 6, seed=21)
    c = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = c.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    rng = np.random.default_rng(3)
    bits = [np.binary_repr(b, n) for b in rng.choice(2 ** n, 24,
                                                     replace=False)]
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, max_bitstrings=24, sc_target=6,
        trials=2, iters=5, betas=np.linspace(3, 21, 10), slicing_repeat=1,
        parallel=False, start_seed=7)
    while len(ctree.tn.sliced) < 4:
        cands = ctree.slice_candidates()
        if not cands:
            break
        ctree.slicing(sorted(cands, key=str)[0])
    sliced = list(ctree.tn.sliced.keys())
    steps, ob, bits_sorted = contraction_scheme_sparse(
        ctree, bits, sc_target=6)
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(
        field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    mesh = dist.global_mesh()
    res = dist.run_sliced_distributed(
        staged, steps, axes, len(sliced), (len(bits_sorted),), mesh,
        field=field, execute=execute_sparse)
    amps = field.unwrap(jax.tree.map(
        lambda a: np.asarray(jax.device_get(a)), res)).reshape(-1)
    if jax.process_index() == 0:
        want = c.state_vec().reshape(-1)
        for amp, bs in zip(amps, bits_sorted):
            assert abs(amp - want[int(bs, 2)]) < 1e-10, (bs, amp)
        np.save(os.environ["OUT_FILE"], amps)
    jax.distributed.shutdown()
""")


def test_two_process_slice_sharding(tmp_path):
    port = 0
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out_file = str(tmp_path / "amps.npy")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count=4")
        env["XLA_FLAGS"] = " ".join(flags)
        env["ARTENSOR_COORDINATOR"] = f"127.0.0.1:{port}"
        env["ARTENSOR_NUM_PROCS"] = "2"
        env["ARTENSOR_PROC_ID"] = str(pid)
        env["OUT_FILE"] = out_file
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER.format(repo=REPO)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    amps = np.load(out_file)
    assert amps.shape == (24,) and np.isfinite(amps).all()
