"""Quick TPU health probe: exits 0 fast if the relay chip answers, 1 otherwise.

The relay terminal is a single-process resource; a killed client can leave a
hung program on the chip that wedges every later request (jax.devices() blocks
indefinitely). Run this before expensive device work:

    timeout 60 python scripts/chip_probe.py && python bench.py
"""
import sys

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print(f"backend: {jax.default_backend()} (not tpu)")
        return 0
    val = float(jnp.sum(jnp.ones(128)))
    assert val == 128.0, val
    print(f"chip ok: {jax.devices()[0]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
