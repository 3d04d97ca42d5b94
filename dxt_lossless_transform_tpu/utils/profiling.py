"""Profiling hooks.

The reference's profiling story is cargo profiles + criterion + flamegraphs
(``src/Cargo.toml:1-20``); the TPU equivalent is ``jax.profiler`` traces viewable in
Perfetto/TensorBoard. Wrap any region with :func:`trace` or pass ``--profile DIR`` to
the CLI.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(out_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax profiler trace into ``out_dir`` (no-op when None)."""
    if not out_dir:
        yield
        return
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        # The relay-tunneled TPU backend cannot serve profiler RPCs; tracing would
        # hang the process. Run the same command on CPU/JAX-native TPU to profile.
        import sys

        print("warning: profiler unsupported on the relay TPU backend; "
              "trace skipped", file=sys.stderr)
        yield
        return
    import jax

    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        yield


def annotate(name: str):
    """Named sub-region inside a trace (shows up in the Perfetto timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
