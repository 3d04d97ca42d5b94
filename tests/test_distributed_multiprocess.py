"""REAL multi-process distribution: 2 host processes, a jax.distributed coordinator,
the sharded BC1 auto-step over the global mesh -- outputs must be byte-identical to
the single-process step.

This is the analog of the reference CI actually executing its cross-architecture
matrix (``.github/workflows/rust.yml:33-72``) rather than only compiling it: the
distributed code path (cluster init, global-array construction, cross-process
collectives from GSPMD, allgather) really runs.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_auto_step_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "scripts", "distributed_worker.py")
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    num_procs = 2

    with tempfile.TemporaryDirectory() as tmp:
        out_path = os.path.join(tmp, "out.npz")
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        # Workers are launched by script path, so sys.path in the child gets
        # scripts/, not the repo root; the package is not pip-installed either.
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs = [subprocess.Popen(
            [sys.executable, worker, coordinator, str(num_procs), str(i), out_path],
            cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True) for i in range(num_procs)]
        outs = [p.communicate(timeout=540) for p in procs]
        for p, (so, se) in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{so}\n{se}"
        got = np.load(out_path)

    # single-process reference on the same deterministic batch
    from dxt_lossless_transform_tpu.parallel import bc1_auto_step_single
    import jax

    B, nblocks = 4, 4096
    rng = np.random.default_rng(17)
    flats = rng.integers(0, 2**32, (B, 2 * nblocks), dtype=np.uint32)
    for b in range(B):
        c0, c1, idx, best = jax.device_get(bc1_auto_step_single(flats[b]))
        np.testing.assert_array_equal(got["c0"][b], c0)
        np.testing.assert_array_equal(got["c1"][b], c1)
        np.testing.assert_array_equal(got["idx"][b], idx)
        assert int(got["best"][b]) == int(best)
