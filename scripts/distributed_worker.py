"""Worker for the multi-process distribution test.

Each process joins a jax.distributed cluster over CPU devices, builds the global
(files, blocks) mesh, runs the sharded BC1 auto-step on a deterministic batch, and
process 0 writes the gathered results to an .npz for the parent test to compare
against single-process output.

Usage: python scripts/distributed_worker.py <coordinator> <num_procs> <proc_id> <out.npz>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    coordinator, num_procs, proc_id, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from dxt_lossless_transform_tpu.parallel.distributed import initialize, is_primary

    assert initialize(coordinator_address=coordinator, num_processes=num_procs,
                      process_id=proc_id)
    assert jax.process_count() == num_procs

    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dxt_lossless_transform_tpu.parallel import bc1_auto_step, make_mesh

    devices = jax.devices()
    mesh = make_mesh(len(devices))

    # Deterministic global batch, identical on every process.
    B, nblocks = 4, 4096
    rng = np.random.default_rng(17)
    flats_np = rng.integers(0, 2**32, (B, 2 * nblocks), dtype=np.uint32)
    valid_np = np.full((B,), 4 * nblocks, np.int32)

    def _global(arr, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])

    flats = _global(flats_np, P("files", "blocks"))
    valid = _global(valid_np, P("files"))

    step = bc1_auto_step(mesh)
    out = step(flats, valid)
    gathered = [np.asarray(multihost_utils.process_allgather(o, tiled=True))
                for o in out]

    if is_primary():
        np.savez(out_path, c0=gathered[0], c1=gathered[1], idx=gathered[2],
                 best=gathered[3])
    multihost_utils.sync_global_devices("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
