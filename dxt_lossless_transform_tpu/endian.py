"""Host-endianness boundary layer + big-endian execution simulation.

The on-disk transformed format is defined LITTLE-ENDIAN everywhere: the 4-byte
embedded header (reference ``file-formats-api/src/embed/mod.rs:147-162``, read
and written via ``u32::from_le/to_le``), every multi-byte stream lane
(``bc3/src/utils.rs:7-40`` shows the reference's big-endian fix-ups), and the
DDS magic. The reference *executes* the LE<->BE portability proof by
cross-compiling its CLI for powerpc64 and running transform-here /
untransform-there under QEMU (``commands/debug_endian/endian_test.rs:43-280``).

No BE hardware or QEMU exists in this environment, so this build proves the
same property by *execution under simulation*: every multi-byte load/store in
the oracle + serialization layer routes through this module, and
:func:`simulate_big_endian` swaps each boundary to what a correctly-ported
big-endian host executes -- a native (big-endian) numpy view plus the explicit
byteswap at the documented LE pin point (the ``from_le`` / ``to_le`` analog).
Any boundary that silently assumed native byte order would produce different
bytes under the simulation; the ``debug-endian`` harness asserts none do, for
every format x settings matrix, in both transform directions (see
``cli/debug.py:cmd_endian`` and ``tests/test_endian.py``).

The simulation flag is process-global and intended for the single-threaded
harness only (mirroring the reference's dedicated debug command).
"""

from __future__ import annotations

import struct
from contextlib import contextmanager

import numpy as np

_SIM_BE = False


@contextmanager
def simulate_big_endian():
    """Execute the wrapped code as a (simulated) big-endian host would."""
    global _SIM_BE
    prev = _SIM_BE
    _SIM_BE = True
    try:
        yield
    finally:
        _SIM_BE = prev


def simulating_big_endian() -> bool:
    return _SIM_BE


def from_bytes(buf, kind: str) -> np.ndarray:
    """Interpret ``buf`` as little-endian ``kind`` ('u2'/'u4'/'u8') lanes.

    Native LE host: a direct ``<`` view. Simulated BE host: the native (``>``)
    view -- which *misreads* LE data -- followed by the explicit byteswap a
    correct BE port performs (``u32::from_le``). Values are identical either
    way; a boundary skipping the fix-up would diverge.
    """
    if _SIM_BE:
        return np.frombuffer(buf, ">" + kind).byteswap()
    return np.frombuffer(buf, "<" + kind)


def to_bytes(arr, kind: str) -> bytes:
    """Serialize integer lanes as little-endian ``kind`` bytes (``to_le``)."""
    if _SIM_BE:
        return np.ascontiguousarray(arr).astype(">" + kind).byteswap().tobytes()
    return np.ascontiguousarray(arr).astype("<" + kind).tobytes()


def empty(shape, kind: str) -> np.ndarray:
    """A host-native-order lane buffer (BE under simulation) for assembly;
    serialize it with :func:`to_bytes`, never ``.tobytes()`` directly."""
    return np.empty(shape, (">" if _SIM_BE else "<") + kind)


def pack_u32(value: int) -> bytes:
    """One u32 -> 4 LE bytes (the embedded-header write, ``embed/mod.rs:159``)."""
    if _SIM_BE:
        return struct.pack(">I", value & 0xFFFFFFFF)[::-1]
    return struct.pack("<I", value & 0xFFFFFFFF)


def unpack_u32(buf: bytes) -> int:
    """4 LE bytes -> u32 (the embedded-header read, ``embed/mod.rs:147``)."""
    if _SIM_BE:
        return struct.unpack(">I", bytes(buf[:4])[::-1])[0]
    return struct.unpack("<I", buf[:4])[0]
