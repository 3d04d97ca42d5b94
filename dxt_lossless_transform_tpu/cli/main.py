"""CLI entry point.

Analog of the reference CLI (``tools/dxt-lossless-transform-cli/src/main.rs:12-88``,
``commands/transform/mod.rs:16-199``): ``transform`` / ``untransform`` over files or
directory trees with the four presets, plus ``debug-*`` subcommands.

Presets (``commands/transform/mod.rs:113-151``):
  low     -- manual default settings, no estimation (fastest)
  medium  -- auto-search with the device LTU estimator (+ zstd-1 identity
             confirmation on the mode-sort formats, ops/bc7.py)
  optimal -- auto-search with the zstd level-1 estimator (level 6 for
             BC7/BC6H, whose full-stream ranking level 1 gets wrong --
             see make_preset_bundle)
  max     -- same estimators, all decorrelation modes (ultra)
"""

from __future__ import annotations

import argparse
import contextlib
import os
import sys
import time
from pathlib import Path

from ..api import (
    Bc1AutoTransformBuilder, Bc2AutoTransformBuilder, Bc3AutoTransformBuilder,
    Bc4AutoTransformBuilder, Bc5AutoTransformBuilder, Bc6hAutoTransformBuilder,
    Bc7AutoTransformBuilder,
    RgbAutoTransformBuilder,
)
from ..estimate import LtuEstimation, ZstdEstimation
from ..formats import TransformBundle, file_io
from ..formats.handlers import DdsHandler
from ..utils.throughput import format_bytes, format_throughput


def _enable_persistent_compile_cache():
    """Persist XLA compilations across CLI invocations (analog of the reference CLI's
    on-disk caches); first-run compile costs are paid once per shape bucket."""
    import jax

    cache_dir = os.environ.get(
        "DLT_COMPILE_CACHE",
        os.path.join(os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                     "dxt-lossless-transform-tpu", "xla-cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def all_handlers():
    """Every registered container handler (``util/handlers.rs``)."""
    return [DdsHandler()]


def make_preset_bundle(preset: str) -> TransformBundle:
    if preset == "low":
        return TransformBundle.default_all()
    if preset == "medium":
        est = est_ms = LtuEstimation()
        ultra = False
    elif preset in ("optimal", "max"):
        est = ZstdEstimation(1)
        # The mode-sort formats score FULL candidate streams, and zstd-1's
        # ranking is measurably wrong there: on the real-encoder BC6H corpus a
        # level-1 argmin ships -0.36% vs zstd-16 while level 6 ships +0.90%
        # (BC7: +0.54% -> +0.70%); level-1 cannot see the long-range structure
        # mode grouping creates (CORPUS_REPORT.md). BC1-BC5 estimate cheap
        # endpoint regions where level 1 ranks correctly and stays fastest.
        est_ms = ZstdEstimation(6)
        ultra = preset == "max"
    else:
        raise ValueError(f"unknown preset {preset!r}")
    mk = (lambda cls, e=est: cls.new_ultra(e) if ultra else cls(e))
    mkrgb = (lambda layout: RgbAutoTransformBuilder.new_ultra(layout, est) if ultra
             else RgbAutoTransformBuilder(layout, est))
    return TransformBundle(bc1=mk(Bc1AutoTransformBuilder),
                           bc2=mk(Bc2AutoTransformBuilder),
                           bc3=mk(Bc3AutoTransformBuilder),
                           bc4=mk(Bc4AutoTransformBuilder),
                           bc5=mk(Bc5AutoTransformBuilder),
                           bc7=mk(Bc7AutoTransformBuilder, est_ms),
                           bc6h=mk(Bc6hAutoTransformBuilder, est_ms),
                           rgba8888=mkrgb("rgba8888"),
                           bgra8888=mkrgb("bgra8888"),
                           bgr888=mkrgb("bgr888"))


def find_all_files(root: Path):
    """Recursive file walk (``util/core.rs:19``)."""
    if root.is_file():
        return [root]
    return sorted(p for p in root.rglob("*") if p.is_file())


def _process_tree(args, work_fn, verb: str):
    """Walk the tree and process every file, with per-file error isolation
    (``util/core.rs:44``) and optional host-thread parallelism (the rayon analog,
    ``commands/transform/mod.rs:166-187``; the host fast path releases the GIL in
    native code, device work serializes anyway)."""
    src, dst = Path(args.input), Path(args.output)
    files = find_all_files(src)
    if not files:
        print(f"no files found under {src}", file=sys.stderr)
        return 1
    failures = []
    t0 = time.perf_counter()

    def one(f: Path) -> int:
        rel = f.relative_to(src) if src.is_dir() else f.name
        out = dst / rel if src.is_dir() else dst
        out.parent.mkdir(parents=True, exist_ok=True)
        try:
            return work_fn(f, out)
        except Exception as e:
            failures.append(f)
            print(f"error: {f}: {type(e).__name__}: {e}", file=sys.stderr)
            return 0

    threads = getattr(args, "threads", 1)
    if threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as pool:
            total = sum(pool.map(one, files))
    else:
        total = sum(one(f) for f in files)
    dt = time.perf_counter() - t0
    print(f"{verb} {len(files) - len(failures)}/{len(files)} files, "
          f"{format_bytes(total)} in {dt:.2f}s ({format_throughput(total, dt)})")
    return 1 if failures else 0


_BATCH_FORMATS = {"bc1", "bc2", "bc3", "bc4", "bc5", "bc7", "bc6h",
                  "rgba8888", "bgra8888", "bgr888"}
_RGB_FORMATS = {"rgba8888", "bgra8888", "bgr888"}
# Host-scored (zstd) batching ships every candidate's region back through the
# host link; above this size the per-file native auto (whose regions never leave
# the C++ runtime) wins, so big files take the per-file path.
_BATCH_ZSTD_MAX_BYTES = int(os.environ.get("DLT_BATCH_ZSTD_MAX_BYTES",
                                           str(8 << 20)))
# Above this size the per-file untransform (hostwrap's chunked, depth-2
# pipelined device path) beats stacking the whole payload into one batch row;
# the batch win exists for the many-small/medium-files regime.
_BATCH_UNTRANSFORM_MAX_BYTES = int(os.environ.get(
    "DLT_BATCH_UNTRANSFORM_MAX_BYTES", str(64 << 20)))
# Mode-sort (BC7/BC6H) batching downloads the winner's whole stream per file and
# assembles candidates on the vmappable XLA path; large files are faster through
# the per-file Mosaic device auto.
_BATCH_MODESORT_MAX_BYTES = int(os.environ.get("DLT_BATCH_MODESORT_MAX_BYTES",
                                               str(8 << 20)))
# RGB batching is a pure host path; the cap bounds how much candidate data one
# batch holds in RAM at once (max_batch files x 4 candidate streams).
_BATCH_RGB_MAX_BYTES = int(os.environ.get("DLT_BATCH_RGB_MAX_BYTES",
                                          str(8 << 20)))


def _batchable(fmt: str, data_length: int, preset: str) -> bool:
    """Does this (format, size) ride the batch pipeline under this preset?
    THE single policy site -- the preset processor factories assume any group
    they receive passed this predicate."""
    if fmt not in _BATCH_FORMATS:
        return False
    if fmt in _RGB_FORMATS:
        return data_length <= _BATCH_RGB_MAX_BYTES  # host-batched
    if preset in ("optimal", "max"):  # host-scored zstd mode
        return fmt not in ("bc7", "bc6h") and data_length <= _BATCH_ZSTD_MAX_BYTES
    if fmt in ("bc7", "bc6h"):
        return data_length <= _BATCH_MODESORT_MAX_BYTES
    return True


def _batch_processors_for_preset(preset: str, max_batch: int):
    """Per-format BatchProcessor factory for a preset, or None for formats the
    preset cannot batch. medium scores on device (LTU candidate search); the
    zstd presets (optimal/max) build candidate regions on device and rank them
    with the native pthread batch estimator, the next batch's device work
    overlapped (``parallel.pipeline._process_host_scored``)."""
    from ..parallel.pipeline import BatchProcessor

    from ..parallel.pipeline import ModeSortBatchProcessor, RgbBatchProcessor

    if preset == "medium":
        def make_medium(fmt):
            if fmt in _RGB_FORMATS:
                return RgbBatchProcessor(fmt, LtuEstimation(),
                                         max_batch=max_batch)
            if fmt in ("bc7", "bc6h"):
                return ModeSortBatchProcessor(fmt, max_batch=max_batch)
            return BatchProcessor(fmt, max_batch=max_batch)

        return make_medium
    if preset in ("optimal", "max"):
        from ..settings import (
            BC1_COMPREHENSIVE_CANDIDATES, BC2_COMPREHENSIVE_CANDIDATES,
            BC3_COMPREHENSIVE_CANDIDATES,
        )

        ultra = preset == "max"
        comp = {"bc1": BC1_COMPREHENSIVE_CANDIDATES,
                "bc2": BC2_COMPREHENSIVE_CANDIDATES,
                "bc3": BC3_COMPREHENSIVE_CANDIDATES}

        def make(fmt):
            # _batchable keeps bc7/bc6h off the zstd presets, so fmt here is
            # BC1-BC5 or an RGB layout
            if fmt in _RGB_FORMATS:
                return RgbBatchProcessor(fmt, ZstdEstimation(1),
                                         max_batch=max_batch)
            return BatchProcessor(
                fmt, max_batch=max_batch, estimator=ZstdEstimation(1),
                candidates=comp[fmt] if ultra and fmt in comp else None)

        return make
    return None


# Batch windows stream this many payload bytes per flush: classification reads
# only each file's header; full file bytes live in RAM for one window at a time
# (plus the device batch in flight), the streaming analog of the reference's
# per-file mmap I/O (``file_io/lightweight_mmap/file.rs:28-212``). Peak RSS is
# therefore ~DLT_STREAM_BYTES + max_batch x bucket, not the corpus size.
_STREAM_WINDOW_BYTES = int(os.environ.get("DLT_STREAM_BYTES", str(256 << 20)))

_HEADER_BYTES = 256  # covers transform header + DDS header (+ DX10 extension)


def _classify_head(f: Path):
    """Read only the first ``_HEADER_BYTES`` of ``f`` (header-only pass)."""
    with open(f, "rb") as fh:
        return fh.read(_HEADER_BYTES)


def _out_path_fn(src: Path, dst: Path):
    src_is_dir = src.is_dir()
    prefix = str(src).rstrip(os.sep) + os.sep  # string fast path: pathlib's
    made = set()  # relative_to costs ~100 us/file. mkdir memoized (a benign
    # race with pool threads -- mkdir is exist_ok)

    def out_path(f: Path) -> Path:
        if src_is_dir:
            sf = str(f)
            rel = (sf[len(prefix):] if sf.startswith(prefix)
                   else str(f.relative_to(src)))
            out = dst / rel
        else:
            out = dst
        parent = out.parent
        if parent not in made:
            parent.mkdir(parents=True, exist_ok=True)
            made.add(parent)
        return out

    return out_path


@contextlib.contextmanager
def _shared_pool(threads: int):
    """One thread pool for a whole CLI command. The batch paths flush many
    streaming windows; a pool per ``_pmap`` call (spawn + join per window)
    dominated small-file wall time."""
    if threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as pool:
            yield pool
    else:
        yield None


def _pmap(fn, items, threads: int, pool=None):
    """Host-thread map preserving order (reads/writes release the GIL).

    Items are dispatched in contiguous slices (2 per worker), not one future
    per item: queue handoff costs more than an 8 KiB read, and
    ``ThreadPoolExecutor.map``'s ``chunksize`` only applies to process pools."""
    n = len(items)
    if n > 1 and (pool is not None or threads > 1):
        def run_slice(chunk):
            return [fn(x) for x in chunk]

        size = max(1, (n + 2 * threads - 1) // (2 * threads))
        chunks = [items[i:i + size] for i in range(0, n, size)]
        if pool is not None:
            parts = pool.map(run_slice, chunks)
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=threads) as tmp:
                parts = list(tmp.map(run_slice, chunks))
        return [r for part in parts for r in part]
    return [fn(x) for x in items]


def _run_per_file(files, work_fn, out_path, failures, threads: int,
                  pool=None) -> int:
    """Per-file path with error isolation (``util/core.rs:44``), optionally
    host-thread parallel (the rayon analog); returns bytes written."""

    def one(f: Path) -> int:
        try:
            return work_fn(f, out_path(f))
        except Exception as e:
            failures.append(f)
            print(f"error: {f}: {type(e).__name__}: {e}", file=sys.stderr)
            return 0

    return sum(_pmap(one, files, threads, pool))


def _transform_batched(args, bundle, handlers):
    """Batch path: group same-format BC1-BC5 DDS payloads across files into
    fixed-shape device batches (``parallel.pipeline.BatchProcessor`` -- the
    rayon-work-stealing analog, ``commands/transform/mod.rs:166-187``), keeping
    per-file error isolation and ordered output. Every auto preset batches
    (medium via the on-device LTU search; optimal/max via device-built regions +
    the native pthread zstd estimator). Other formats and non-DDS files take the
    per-file path.

    Streaming: the classification pass reads only file headers; payload bytes
    are read per window (``_STREAM_WINDOW_BYTES``) and dropped after their
    outputs are written, bounding peak RSS independent of corpus size."""
    from ..formats.dds import parse_dds
    from ..formats.embed import TRANSFORM_HEADER_SIZE, TransformHeader
    from ..formats.handlers import _DDS_TO_TRANSFORM

    for_header = {"bc1": TransformHeader.for_bc1, "bc2": TransformHeader.for_bc2,
                  "bc3": TransformHeader.for_bc3, "bc4": TransformHeader.for_bc4,
                  "bc5": TransformHeader.for_bc5, "bc7": TransformHeader.for_bc7,
                  "bc6h": TransformHeader.for_bc6h}
    from ..formats.embed import TransformFormat

    for name, tf in (("rgba8888", TransformFormat.RGBA8888),
                     ("bgra8888", TransformFormat.BGRA8888),
                     ("bgr888", TransformFormat.BGR888)):
        for_header[name] = (lambda s_, tf_=tf:
                            TransformHeader.for_rgb(tf_, s_))

    src, dst = Path(args.input), Path(args.output)
    files = find_all_files(src)
    if not files:
        print(f"no files found under {src}", file=sys.stderr)
        return 1
    failures, total = [], 0
    t0 = time.perf_counter()
    out_path = _out_path_fn(src, dst)

    make_proc = _batch_processors_for_preset(args.preset,
                                             getattr(args, "max_batch", 64))

    # Pass 1 (header-only): partition batchable DDS files vs per-file fallback.
    groups: dict = {fmt: [] for fmt in _BATCH_FORMATS}
    fallback = []
    for f in files:
        try:
            head = _classify_head(f)
            info = parse_dds(head)
            fmt = (_DDS_TO_TRANSFORM.get(info.format).name.lower()
                   if info is not None and _DDS_TO_TRANSFORM.get(info.format)
                   else None)
            if (fmt is not None
                    and f.stat().st_size >= info.data_offset + info.data_length
                    and _batchable(fmt, info.data_length, args.preset)):
                groups[fmt].append((f, info))
            else:
                fallback.append(f)
        except Exception as e:
            failures.append(f)
            print(f"error: {f}: {type(e).__name__}: {e}", file=sys.stderr)

    threads = getattr(args, "threads", 1)

    def flush(fmt, proc, window, pool):
        nonlocal total
        # Per-file read isolation: a file deleted/truncated between the
        # header-only classify pass and this flush (windows buffer up to
        # _STREAM_WINDOW_BYTES) must not sink the batch -- reroute it to the
        # per-file path, which re-reads and reports the real error.
        def read_one(e):
            try:
                data = e[0].read_bytes()
                info = e[1]
                if len(data) < info.data_offset + info.data_length:
                    return None  # shrank since classification
                return data
            except OSError:
                return None

        datas = _pmap(read_one, window, threads, pool)
        stale = [f for (f, _), d in zip(window, datas) if d is None]
        if stale:
            fallback.extend(stale)
            window = [e for e, d in zip(window, datas) if d is not None]
            datas = [d for d in datas if d is not None]
            if not window:
                return
        payloads = [data[info.data_offset:info.data_offset + info.data_length]
                    for (_, info), data in zip(window, datas)]
        try:
            results = proc.process(payloads)
            if len(results) != len(window):  # a partial result set must fail
                raise RuntimeError(          # loudly, not misalign files
                    f"processor returned {len(results)} results for "
                    f"{len(window)} payloads")
        except Exception as e:
            print(f"batch {fmt} failed ({type(e).__name__}: {e}); "
                  "falling back to per-file", file=sys.stderr)
            fallback.extend(f for f, _ in window)
            return

        def write_one(job):
            (f, info), data, res = job
            try:
                header = for_header[fmt](res.settings)
                start = info.data_offset
                end = start + info.data_length
                out = (header.to_bytes() + data[TRANSFORM_HEADER_SIZE:start]
                       + res.transformed + data[end:])
                out_path(f).write_bytes(out)
                return len(out)
            except Exception as e:
                failures.append(f)
                print(f"error: {f}: {type(e).__name__}: {e}", file=sys.stderr)
                return 0

        total += sum(_pmap(write_one, list(zip(window, datas, results)),
                           threads, pool))

    with _shared_pool(threads) as pool:
        for fmt, entries in groups.items():
            if not entries:
                continue
            proc = make_proc(fmt) if make_proc is not None else None
            if proc is None:
                fallback.extend(f for f, _ in entries)
                continue
            window, acc = [], 0
            for f, info in entries:
                window.append((f, info))
                acc += info.data_length
                if acc >= _STREAM_WINDOW_BYTES:
                    flush(fmt, proc, window, pool)
                    window, acc = [], 0
            if window:
                flush(fmt, proc, window, pool)

        def work(f, out):
            return file_io.transform_file_with_multiple_handlers(
                handlers, bundle, f, out, f.suffix)

        total += _run_per_file(fallback, work, out_path, failures, threads,
                               pool)

    dt = time.perf_counter() - t0
    print(f"transformed {len(files) - len(failures)}/{len(files)} files "
          f"(batched), {format_bytes(total)} in {dt:.2f}s "
          f"({format_throughput(total, dt)})")
    return 1 if failures else 0


def _untransform_batched(args, handlers):
    """Batched load path (the reference's headline direction,
    ``bc1-api/README.MD:286-313``): classify transformed DDS files by their
    embedded 4-byte header (header-only reads), group payloads by format, and
    restore them through ``parallel.pipeline.UntransformBatchProcessor`` --
    settings decoded per file, grouped as static kernel arguments. Files the
    classifier rejects take the per-file handler path. Streaming windows bound
    peak RSS exactly like :func:`_transform_batched`."""
    from ..formats.dds import DDS_MAGIC, parse_dds_ignore_magic
    from ..formats.embed import TransformHeader
    from ..formats.handlers import transformed_payload_len
    from ..parallel.pipeline import UntransformBatchProcessor

    settings_of = {
        "bc1": TransformHeader.bc1_settings, "bc2": TransformHeader.bc2_settings,
        "bc3": TransformHeader.bc3_settings, "bc4": TransformHeader.bc4_settings,
        "bc5": TransformHeader.bc5_settings, "bc7": TransformHeader.bc7_settings,
        "bc6h": TransformHeader.bc6h_settings,
        "rgba8888": TransformHeader.rgb_settings,
        "bgra8888": TransformHeader.rgb_settings,
        "bgr888": TransformHeader.rgb_settings,
    }

    src, dst = Path(args.input), Path(args.output)
    files = find_all_files(src)
    if not files:
        print(f"no files found under {src}", file=sys.stderr)
        return 1
    failures, total = [], 0
    t0 = time.perf_counter()
    out_path = _out_path_fn(src, dst)
    magic = DDS_MAGIC.to_bytes(4, "little")

    # Pass 1 (header-only): decode each file's embedded transform header.
    groups: dict = {}
    fallback = []
    for f in files:
        try:
            head = _classify_head(f)
            header = TransformHeader.from_bytes(head)
            info = parse_dds_ignore_magic(head)
            fmt = header.format.name.lower()
            if info is None or fmt not in settings_of:
                fallback.append(f)
                continue
            start = info.data_offset
            end = start + transformed_payload_len(header, info.data_length)
            if (f.stat().st_size < end
                    or end - start > _BATCH_UNTRANSFORM_MAX_BYTES):
                fallback.append(f)  # huge payloads: per-file chunked pipeline
                continue
            groups.setdefault(fmt, []).append(
                (f, start, end, settings_of[fmt](header)))
        except Exception:
            fallback.append(f)  # per-file path reports the real error

    threads = getattr(args, "threads", 1)

    def flush(fmt, proc, window, pool):
        nonlocal total
        # Same per-file read isolation as the transform flush: reroute files
        # that vanished or shrank since classification to the per-file path.
        def read_one(e):
            try:
                data = e[0].read_bytes()
                if len(data) < e[2]:  # end offset
                    return None
                return data
            except OSError:
                return None

        datas = _pmap(read_one, window, threads, pool)
        stale = [f for (f, *_), d in zip(window, datas) if d is None]
        if stale:
            fallback.extend(stale)
            window = [e for e, d in zip(window, datas) if d is not None]
            datas = [d for d in datas if d is not None]
            if not window:
                return
        payloads = [(data[start:end], settings)
                    for (_, start, end, settings), data in zip(window, datas)]
        try:
            results = proc.process(payloads)
            if len(results) != len(window):
                raise RuntimeError(
                    f"processor returned {len(results)} results for "
                    f"{len(window)} payloads")
        except Exception as e:
            print(f"untransform batch {fmt} failed ({type(e).__name__}: {e}); "
                  "falling back to per-file", file=sys.stderr)
            fallback.extend(f for f, _, _, _ in window)
            return

        def write_one(job):
            (f, start, end, _), data, payload = job
            try:
                out = magic + data[4:start] + payload + data[end:]
                out_path(f).write_bytes(out)
                return len(out)
            except Exception as e:
                failures.append(f)
                print(f"error: {f}: {type(e).__name__}: {e}", file=sys.stderr)
                return 0

        total += sum(_pmap(write_one, list(zip(window, datas, results)),
                           threads, pool))

    with _shared_pool(threads) as pool:
        for fmt, entries in groups.items():
            proc = UntransformBatchProcessor(
                fmt, max_batch=getattr(args, "max_batch", 64))
            window, acc = [], 0
            for entry in entries:
                window.append(entry)
                acc += entry[2] - entry[1]
                if acc >= _STREAM_WINDOW_BYTES:
                    flush(fmt, proc, window, pool)
                    window, acc = [], 0
            if window:
                flush(fmt, proc, window, pool)

        def work(f, out):
            return file_io.untransform_file_with_multiple_handlers(
                handlers, f, out, f.suffix)

        total += _run_per_file(fallback, work, out_path, failures, threads,
                               pool)

    dt = time.perf_counter() - t0
    print(f"untransformed {len(files) - len(failures)}/{len(files)} files "
          f"(batched), {format_bytes(total)} in {dt:.2f}s "
          f"({format_throughput(total, dt)})")
    return 1 if failures else 0


def cmd_transform(args):
    bundle = make_preset_bundle(args.preset)
    handlers = all_handlers()

    batch = getattr(args, "batch", None)
    if batch is None:
        batch = args.preset in ("medium", "optimal", "max")  # every auto preset
    if batch and args.preset == "low":
        print("--batch applies to the auto presets only (low uses manual default "
              "settings; the per-file path is already fastest); using per-file "
              "path", file=sys.stderr)
        batch = False
    if batch:
        return _transform_batched(args, bundle, handlers)

    def work(f, out):
        return file_io.transform_file_with_multiple_handlers(
            handlers, bundle, f, out, f.suffix)

    return _process_tree(args, work, "transformed")


def cmd_untransform(args):
    handlers = all_handlers()

    batch = getattr(args, "batch", None)
    if batch is None:
        batch = True  # the load path always benefits from batching
    if batch:
        return _untransform_batched(args, handlers)

    def work(f, out):
        return file_io.untransform_file_with_multiple_handlers(handlers, f, out, f.suffix)

    return _process_tree(args, work, "untransformed")


_PARSER = None


def _build_parser():
    parser = argparse.ArgumentParser(
        prog="dxt-lossless-transform-tpu",
        description="TPU-native lossless transforms for block-compressed DDS textures")
    sub = parser.add_subparsers(dest="command", required=True)

    p_t = sub.add_parser("transform", help="transform files for better compression")
    p_t.add_argument("input", help="input file or directory")
    p_t.add_argument("output", help="output file or directory")
    p_t.add_argument("--preset", default="optimal",
                     choices=["low", "medium", "optimal", "max"])
    p_t.add_argument("--threads", type=int, default=os.cpu_count() or 1,
                     help="host worker threads (device work serializes regardless)")
    p_t.add_argument("--batch", action=argparse.BooleanOptionalAction, default=None,
                     help="pack same-format textures into device batches "
                          "(default: on for the auto presets)")
    p_t.add_argument("--max-batch", type=int, default=64, dest="max_batch",
                     help="files per packed device batch")
    p_t.set_defaults(fn=cmd_transform)

    p_u = sub.add_parser("untransform", help="restore original files byte-for-byte")
    p_u.add_argument("input")
    p_u.add_argument("output")
    p_u.add_argument("--threads", type=int, default=os.cpu_count() or 1)
    p_u.add_argument("--batch", action=argparse.BooleanOptionalAction, default=None,
                     help="pack same-recipe textures into batched device restores "
                          "(default: on)")
    p_u.add_argument("--max-batch", type=int, default=64, dest="max_batch",
                     help="files per packed device batch")
    p_u.set_defaults(fn=cmd_untransform)

    from . import debug as _debug
    _debug.register(sub)

    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="capture a jax profiler trace into DIR")
    return parser


def main(argv=None):
    global _PARSER
    if _PARSER is None:  # argparse construction (gettext et al.) is ~10 ms;
        _PARSER = _build_parser()  # in-process callers (bench, tests) loop
    args = _PARSER.parse_args(argv)
    _enable_persistent_compile_cache()
    from .. import runtime
    runtime.available() or runtime.build()  # host fast path wants the native library
    from ..utils.profiling import trace
    with trace(args.profile):
        return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
