"""Quick TPU health probe: exits 0 fast if the relay chip answers, 1 otherwise.

The relay terminal is a single-process resource; a killed client can leave a
hung program on the chip that wedges every later request (jax.devices() blocks
indefinitely, typically until a remote watchdog resets ~30 min later). Run this
before expensive device work:

    python scripts/chip_probe.py && python bench.py

The probe carries its OWN deadline (SIGALRM, default 90 s, env
``DLT_PROBE_TIMEOUT_S``) so it never needs an external ``timeout`` wrapper --
a wedged chip yields exit code 2 and a one-line diagnosis instead of a hang.
"""
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    deadline = float(os.environ.get("DLT_PROBE_TIMEOUT_S", "90"))

    def on_alarm(signum, frame):
        print(f"chip UNRESPONSIVE: no reply within {deadline:.0f}s -- either a "
              "wedged relay executor (a killed client hangs it; remote watchdog "
              "resets ~30 min) or heavy co-tenant load (uploads have measured "
              "200+ s under contention). Retry in >=10 min before concluding "
              "wedged.", flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.setitimer(signal.ITIMER_REAL, deadline)

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print(f"backend: {jax.default_backend()} (not tpu)")
        return 0
    val = float(jnp.sum(jnp.ones(128)))
    assert val == 128.0, val
    signal.setitimer(signal.ITIMER_REAL, 0.0)
    print(f"chip ok: {jax.devices()[0]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
