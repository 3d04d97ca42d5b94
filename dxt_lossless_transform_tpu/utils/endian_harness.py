"""Endian-portability EXECUTION harness (the ``debug-endian`` analog).

The reference proves its on-disk transformed format is endian-portable by
cross-compiling the CLI for x86_64 + powerpc64 (big-endian), transforming the
DDS assets on one architecture, untransforming on the other, and byte-comparing
(``commands/debug_endian/endian_test.rs:43-280``). Docker/QEMU is unavailable
here, so this harness executes the same property under byteswap simulation:
every multi-byte serialization boundary in the oracle + formats layer routes
through :mod:`..endian`, and :func:`..endian.simulate_big_endian` swaps each
boundary to the big-endian-host form (native ``>`` views + the explicit
byteswap of a correct ``from_le``/``to_le`` port).

Per (format x settings x payload) the harness asserts, exactly like the
reference's transform-here/untransform-there matrix:

  1. transform(LE host) == transform(BE host)            [bytes]
  2. untransform on BE of the LE-transformed == original  [LE -> BE leg]
  3. untransform on LE of the BE-transformed == original  [BE -> LE leg]
  4. the 4-byte embedded header bytes agree and parse back on either host
  5. whole-container DDS transform/untransform agree across hosts
     (header fields, magic, and payload slicing all ride the endian layer)

Scope note: the simulation covers the Python/numpy layer that DEFINES the
on-disk bytes. The device (XLA/Mosaic) and native C++ paths are proven equal
to this oracle by the differential test net (tests/test_ops_bc.py,
utils/parity.py), so endian-invariance extends to them transitively: their
outputs are byte-identical to an implementation proven endian-invariant here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from .. import endian
from ..formats.dds import DDS_MAGIC, parse_dds, parse_dds_ignore_magic
from ..formats.embed import TransformFormat, TransformHeader
from ..oracle import bc1, bc2, bc3, bc4 as bc45, bc6h, bc7, rgb
from ..settings import (
    Bc1TransformSettings, Bc2TransformSettings, Bc3TransformSettings,
    Bc4TransformSettings, Bc5TransformSettings, Bc6hTransformSettings,
    Bc7TransformSettings, RgbTransformSettings,
)


@dataclass
class _Fmt:
    name: str
    block_size: int
    settings: tuple
    transform: Callable
    untransform: Callable
    header: Optional[Callable]  # settings -> TransformHeader (None: no container)
    settings_of: Optional[Callable]  # TransformHeader -> settings


def _formats() -> List[_Fmt]:
    mk = TransformHeader
    rgb_fmt = {"rgba8888": TransformFormat.RGBA8888,
               "bgra8888": TransformFormat.BGRA8888,
               "bgr888": TransformFormat.BGR888}
    out = [
        _Fmt("bc1", 8, tuple(Bc1TransformSettings.all_combinations()),
             bc1.transform, bc1.untransform, mk.for_bc1, mk.bc1_settings),
        _Fmt("bc2", 16, tuple(Bc2TransformSettings.all_combinations()),
             bc2.transform, bc2.untransform, mk.for_bc2, mk.bc2_settings),
        _Fmt("bc3", 16, tuple(Bc3TransformSettings.all_combinations()),
             bc3.transform, bc3.untransform, mk.for_bc3, mk.bc3_settings),
        _Fmt("bc4", 8, tuple(Bc4TransformSettings.all_combinations()),
             bc45.transform_bc4, bc45.untransform_bc4, mk.for_bc4,
             mk.bc4_settings),
        _Fmt("bc5", 16, tuple(Bc5TransformSettings.all_combinations()),
             bc45.transform_bc5, bc45.untransform_bc5, mk.for_bc5,
             mk.bc5_settings),
        _Fmt("bc7", 16, tuple(Bc7TransformSettings.all_combinations()),
             bc7.transform, bc7.untransform, mk.for_bc7, mk.bc7_settings),
        _Fmt("bc6h", 16, tuple(Bc6hTransformSettings.all_combinations()),
             bc6h.transform, bc6h.untransform, mk.for_bc6h, mk.bc6h_settings),
    ]
    for layout, tf in rgb_fmt.items():
        bpp = 3 if layout == "bgr888" else 4
        out.append(_Fmt(
            layout, bpp, tuple(RgbTransformSettings.all_combinations()),
            (lambda d, s, _l=layout: rgb.transform(d, _l, s)),
            (lambda d, s, _l=layout: rgb.untransform(d, _l, s)),
            (lambda s, _tf=tf: TransformHeader.for_rgb(_tf, s)),
            mk.rgb_settings))
    return out


@dataclass
class EndianReport:
    checks: int = 0
    per_format: Dict[str, int] = field(default_factory=dict)
    containers: int = 0

    def ok(self) -> bool:  # the harness raises on first mismatch instead
        return self.checks > 0


def _check_payload(f: _Fmt, payload: bytes, report: EndianReport):
    for s in f.settings:
        t_le = f.transform(payload, s)
        with endian.simulate_big_endian():
            t_be = f.transform(payload, s)
        if t_le != t_be:
            raise AssertionError(f"{f.name} {s}: BE-host transform bytes differ")
        with endian.simulate_big_endian():
            back = f.untransform(t_le, s)
        if back != payload:
            raise AssertionError(
                f"{f.name} {s}: transform(LE) -> untransform(BE) not identity")
        if f.untransform(t_be, s) != payload:
            raise AssertionError(
                f"{f.name} {s}: transform(BE) -> untransform(LE) not identity")
        # embedded header: bytes + parse-back on either host
        h_le = f.header(s).to_bytes()
        with endian.simulate_big_endian():
            h_be = f.header(s).to_bytes()
            parsed = f.settings_of(TransformHeader.from_bytes(h_le))
        if h_le != h_be:
            raise AssertionError(f"{f.name} {s}: header bytes differ on BE host")
        if parsed != s:
            raise AssertionError(f"{f.name} {s}: BE-host header parse-back differs")
        report.checks += 4
        report.per_format[f.name] = report.per_format.get(f.name, 0) + 4


def _container_roundtrip(data: bytes, f: _Fmt, s, report: EndianReport):
    """Whole-DDS transform/untransform on both simulated hosts, byte-compared.

    Mirrors ``DdsHandler`` using the oracle transforms (the handler's ops layer
    is differential-tested equal to the oracle; see module docstring)."""

    def transform_container():
        info = parse_dds(data)
        start, end = info.data_offset, info.data_offset + info.data_length
        t = f.transform(data[start:end], s)
        return f.header(s).to_bytes() + data[4:start] + t + data[end:]

    def untransform_container(tdata: bytes):
        header = TransformHeader.from_bytes(tdata)
        info = parse_dds_ignore_magic(tdata)
        start = info.data_offset
        tlen = info.data_length
        if f.name in ("bc7", "bc6h"):
            tlen = bc7.transformed_len(info.data_length, s)
        payload = f.untransform(tdata[start:start + tlen],
                                f.settings_of(header))
        return (endian.pack_u32(DDS_MAGIC) + tdata[4:start] + payload
                + tdata[start + tlen:])

    t_le = transform_container()
    with endian.simulate_big_endian():
        info_be = parse_dds(data)
        t_be = transform_container()
    if parse_dds(data) != info_be:
        raise AssertionError(f"{f.name}: BE-host DDS parse differs")
    if t_le != t_be:
        raise AssertionError(f"{f.name}: BE-host container transform differs")
    with endian.simulate_big_endian():
        back_be = untransform_container(t_le)
    if back_be != data or untransform_container(t_be) != data:
        raise AssertionError(f"{f.name}: cross-host container round trip failed")
    report.containers += 1
    report.checks += 3


_ASSET_FMT = {"r2-256-bc1.dds": "bc1", "r2-256-bc2.dds": "bc2",
              "r2-256-bc3.dds": "bc3", "r2-256-bc7.dds": "bc7"}


def run_matrix(assets_dir: Optional[str] = None, n_blocks: int = 256,
               seed: int = 0, log=lambda *_: None) -> EndianReport:
    """Run the full endian matrix; raises ``AssertionError`` on any divergence."""
    rng = np.random.default_rng(seed)
    report = EndianReport()
    fmts = {f.name: f for f in _formats()}

    for f in fmts.values():
        payload = rng.integers(0, 256, f.block_size * n_blocks,
                               dtype=np.uint8).tobytes()
        _check_payload(f, payload, report)
        log(f"{f.name}: {len(f.settings)} settings x 4 checks ok (synthetic)")

    # Synthetic full containers for every format the generator covers.
    from . import testgen

    for name, maker in [("bc1", lambda: testgen.make_dds("BC1", 32, 32, seed=3)),
                        ("bc3", lambda: testgen.make_dds("BC3", 16, 16, seed=4)),
                        ("bc7", lambda: testgen.make_dx10_dds("BC7", 16, 16,
                                                              seed=5))]:
        f = fmts[name]
        _container_roundtrip(maker(), f, f.settings[0], report)
        log(f"{name}: synthetic container cross-host round trip ok")

    if assets_dir is not None:
        import os

        for fname, fmt in _ASSET_FMT.items():
            path = os.path.join(assets_dir, fname)
            if not os.path.isfile(path):
                continue
            with open(path, "rb") as fh:
                data = fh.read()
            f = fmts[fmt]
            for s in f.settings:
                _container_roundtrip(data, f, s, report)
            log(f"{fmt}: reference asset x {len(f.settings)} settings "
                "cross-host ok")
    return report
