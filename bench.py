"""Round benchmark: prints ONE JSON line with the headline metric.

Headline: BC1 on-device round-trip (transform + untransform) SUSTAINED throughput
per chip, compared against the reference's published single-thread numbers
(transform ~24 GB/s, untransform ~32.2 GB/s decimal => combined 13.75 GB/s;
BASELINE.md rows 1-2).

Robustness contract (round-4 rebalance):
- A SIGALRM-bounded chip liveness probe runs FIRST: a wedged relay chip (a killed
  client's hung executor) produces a clean ``{"chip": "wedged"}`` artifact within
  ~60 s instead of hanging the round into rc=124.
- The headline stage runs next; every later stage is optional detail, ordered
  EVIDENCE FIRST (kernel parity, corpus ratio, CLI pipeline -- the stages that
  turn perf claims into tested claims, ``bc3-api/README.MD:88-95``) and perf
  detail after.
- One 128 MiB buffer is uploaded ONCE and shared by every kernel/auto stage: the
  relay moves host->device bytes at only a few MB/s, so per-stage uploads were
  what starved the round-3 budget (~20 s each).
- A global wall-clock budget (``DLT_BENCH_BUDGET_S``, default 330 s) is enforced:
  stages are skipped once the remaining budget drops below their cost estimate,
  and a SIGALRM backstop aborts a stuck stage.
- The final JSON line is also emitted from a SIGTERM handler, so even an external
  ``timeout`` kill leaves the headline in the output tail.
- ``BENCH_DETAILS.json`` is rewritten incrementally after every stage.
- XLA compilations persist in a repo-local committed cache (``.xla_cache``) so a
  driver run never pays cold Mosaic compiles.

Methodology: kernel rates are measured with K round-trips chained inside one jit
(back-to-back device execution, as a streaming pipeline with >=2 buffers in flight
sustains) and reported as the BEST OF 3 TRIALS -- the shared relay chip shows ~2x
run-to-run contention noise from co-tenants, which is not a property of the kernel
under test; single-trial means would report the co-tenant, not the kernel. The
~2 ms per-dispatch relay latency is reported separately as single-dispatch rates
in BENCH_DETAILS.json.
"""

import contextlib
import io
import json
import os
import signal
import sys
import time

import numpy as np

_T0 = time.time()  # reset after the chip probe: budget covers bench WORK
CHAIN_K = 8
TRIALS = 3
BUDGET_S = float(os.environ.get("DLT_BENCH_BUDGET_S", "330"))
NBYTES = int(os.environ.get("DLT_BENCH_BYTES", str(128 * 1024 * 1024)))
# Reference combined round-trip rate: 1 / (1/24 + 1/32.2) GB/s (decimal GB)
BASELINE_ROUNDTRIP_GBPS = 1.0 / (1.0 / 24.0 + 1.0 / 32.2)

_details = {}
_headline = {"value": 0.0}
_finalized = False


def _remaining():
    return BUDGET_S - (time.time() - _T0)


def _stage_log(msg):
    print(f"[bench +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _flush_details():
    try:
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(_details, f, indent=2)
    except OSError:
        pass


def _finalize(*_args):
    """Print the single headline JSON line (idempotent; also the signal handler)."""
    global _finalized
    if _finalized:
        return
    _finalized = True
    _flush_details()
    value = _headline["value"]
    print(json.dumps({
        "metric": "bc1_roundtrip_sustained_throughput_per_chip",
        "value": round(value, 3),
        "unit": "GB/s",
        "vs_baseline": round(value / BASELINE_ROUNDTRIP_GBPS, 3),
    }), flush=True)


def _on_term(signum, frame):
    _stage_log(f"signal {signum}: emitting headline and exiting")
    _finalize()
    os._exit(0)


class _StageTimeout(Exception):
    pass


def _on_alarm(signum, frame):
    raise _StageTimeout()


def run_stage(name, fn, cost_s, required=False):
    """Run one bench stage under the global budget.

    Skips the stage when the remaining budget is below its cost estimate; arms a
    SIGALRM backstop at the remaining budget so a stuck compile can't eat the
    whole run. Failures are recorded in details, never fatal (unless required).
    """
    rem = _remaining()
    if not required and rem < cost_s:
        _stage_log(f"SKIP {name} (needs ~{cost_s:.0f}s, {rem:.0f}s left)")
        _details.setdefault("skipped", []).append(name)
        return None
    _stage_log(name)
    signal.setitimer(signal.ITIMER_REAL, max(rem, 5.0))
    try:
        return fn()
    except _StageTimeout:
        _stage_log(f"TIMEOUT in {name}")
        _details.setdefault("timed_out", []).append(name)
        return None
    except Exception as exc:  # detail stages must not kill the headline
        if required:
            raise
        _stage_log(f"FAIL {name}: {exc!r}")
        _details.setdefault("failed", {})[name] = repr(exc)
        return None
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0.0)
        _flush_details()


def _sync(x):
    """Force real completion: the axon relay's block_until_ready is unreliable, so
    read back a scalar that depends on the data."""
    import jax.numpy as jnp

    leaf = x
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    return float(jnp.max(leaf.astype(jnp.float32)))


def _bench(fn, *args, iters=20, warmup=2, trials=1):
    """Mean seconds/call; with trials > 1, the best trial mean (see module
    docstring: best-of-N damps the relay's co-tenant contention noise and is the
    labeled methodology for every 'sustained' number)."""
    best = None
    for t in range(trials):
        for _ in range(warmup if t == 0 else 0):
            out = fn(*args)
        _sync(out if t == 0 and warmup else fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def _chain(fmt):
    """Jitted function running CHAIN_K transform+untransform pairs for one format."""
    import jax

    from dxt_lossless_transform_tpu.ops.pallas import shuffle as pk

    def bc1(flat):
        for _ in range(CHAIN_K):
            streams = pk.bc1_transform_tpu.__wrapped__(flat, 1, True, False)
            flat = pk.bc1_untransform_tpu.__wrapped__(tuple(streams), 1, True, False)
        return flat

    def bc2(flat):
        for _ in range(CHAIN_K):
            streams = pk.bc2_transform_tpu.__wrapped__(flat, 1, True, False)
            flat = pk.bc2_untransform_tpu.__wrapped__(tuple(streams), 1, True, False)
        return flat

    def bc3(flat):
        for _ in range(CHAIN_K):
            streams = pk.bc3_transform_tpu.__wrapped__(flat, 1, True, True, False)
            flat = pk.bc3_untransform_tpu.__wrapped__(tuple(streams), 1, True, True,
                                                      False)
        return flat

    def bc4(flat):
        for _ in range(CHAIN_K):
            streams = pk.bc4_transform_tpu.__wrapped__(flat, True, False)
            flat = pk.bc4_untransform_tpu.__wrapped__(tuple(streams), True, False)
        return flat

    def bc5(flat):
        for _ in range(CHAIN_K):
            streams = pk.bc5_transform_tpu.__wrapped__(flat, True, False)
            flat = pk.bc5_untransform_tpu.__wrapped__(tuple(streams), True, False)
        return flat

    return jax.jit({"bc1": bc1, "bc2": bc2, "bc3": bc3, "bc4": bc4, "bc5": bc5}[fmt])


def _probe_chip(deadline_s: float = 120.0, attempt: int = 1) -> bool:
    """SIGALRM-bounded liveness check. Each attempt is recorded as a structured
    ``probe_attempts`` entry; the caller decides when a stall means "wedged"
    (a healthy retry must leave no wedge banner anywhere in the log tail)."""
    import jax

    class _Stalled(Exception):
        pass

    def on_alarm(signum, frame):
        raise _Stalled()

    record = {"attempt": attempt, "deadline_s": deadline_s}
    _details.setdefault("probe_attempts", []).append(record)
    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.setitimer(signal.ITIMER_REAL, deadline_s)
    t0 = time.time()
    try:
        import jax.numpy as jnp

        backend = jax.default_backend()
        if backend == "tpu":
            assert float(jnp.sum(jnp.ones(128))) == 128.0
        record["result"] = "ok"
        record["elapsed_s"] = round(time.time() - t0, 1)
        _details["chip"] = ("ok" if backend == "tpu" else backend) + \
            (" (second attempt)" if attempt > 1 else "")
        return True
    except _Stalled:
        record["result"] = "stalled"
        record["elapsed_s"] = round(time.time() - t0, 1)
        return False
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0.0)
        signal.signal(signal.SIGALRM, old)


def main():
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # Repo-local committed compile cache: a cold driver run hits warm entries.
    os.environ.setdefault(
        "DLT_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"))
    from dxt_lossless_transform_tpu.cli.main import _enable_persistent_compile_cache

    _enable_persistent_compile_cache()

    if os.environ.get("DLT_BENCH_CPU") == "1":
        # Debug hook: this environment's sitecustomize latches JAX_PLATFORMS
        # before we run, so the config update is the only way to force CPU.
        import jax

        jax.config.update("jax_platforms", "cpu")

    # Two probe attempts: the relay flaps under co-tenant load (a probe has
    # succeeded seconds before a 120 s stall), so one transient stall must not
    # produce a wedged artifact for the whole round. Probe history is the
    # structured ``probe_attempts`` field; the WEDGED banner is printed only
    # when the bench actually gives up.
    if not _probe_chip(attempt=1):
        _stage_log("probe attempt 1 stalled; retry in 45s "
                   "(transient relay flap vs real wedge)")
        time.sleep(45.0)
        if not _probe_chip(deadline_s=150.0, attempt=2):
            _details["chip"] = "wedged"
            _details["chip_note"] = (
                "no relay response on either probe attempt; a killed client's "
                "hung executor (remote watchdog resets ~30 min; healthy cold "
                "init takes ~10-30 s) -- scripts/chip_probe.py")
            _stage_log("CHIP WEDGED: emitting fast-fail artifact")
            _finalize()
            return
    # The stage budget covers bench WORK; probe/init time (10s healthy, ~170s
    # after a relay flap) would otherwise starve the trailing stages.
    global _T0
    _T0 = time.time()
    signal.signal(signal.SIGALRM, _on_alarm)

    import jax
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.ops import bc1, bc2, bc3

    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    _details["device"] = str(jax.devices()[0])
    _details["budget_s"] = BUDGET_S
    _details["methodology"] = {
        "sustained": f"{CHAIN_K} roundtrips chained in one jit "
                     f"(streaming-pipeline rate), BEST OF {TRIALS} TRIALS "
                     "(the shared relay chip shows ~2x co-tenant contention "
                     "noise; the best trial measures the kernel, not the "
                     "co-tenant)",
        "single_dispatch": "one transform per dispatch through the relay "
                           "(~2 ms fixed overhead)"}
    nbytes = NBYTES
    results = {}
    _details["kernels"] = results

    # ---- ONE shared payload upload (the relay's host->device link is the
    # scarce resource: ~20 s per 128 MiB; round 3 paid it once per stage) ----
    shared = {}

    def stage_upload():
        shared["words"] = jnp.asarray(
            rng.integers(0, 2**32, nbytes // 4, dtype=np.uint32))
        _sync(shared["words"])

    run_stage("payload upload", stage_upload, cost_s=0, required=True)

    # ---- HEADLINE: BC1 sustained roundtrip ----
    def stage_headline():
        words = shared["words"]
        fwd = lambda w: bc1.transform_device(w, 1, True)
        inv = lambda s: bc1.untransform_device(s, 1, True)
        streams = fwd(words)
        entry = {"transform_single_dispatch_GBps": nbytes / _bench(fwd, words) / 1e9,
                 "untransform_single_dispatch_GBps":
                     nbytes / _bench(inv, streams) / 1e9}
        results["bc1"] = entry
        # fallback headline: single-dispatch roundtrip rate (refined below)
        _headline["value"] = 1.0 / (1.0 / entry["transform_single_dispatch_GBps"]
                                    + 1.0 / entry["untransform_single_dispatch_GBps"])
        if on_tpu:
            t_rt = _bench(_chain("bc1"), words, iters=5, trials=TRIALS)
            entry["roundtrip_sustained_GBps"] = nbytes * CHAIN_K / t_rt / 1e9
            _headline["value"] = entry["roundtrip_sustained_GBps"]

    run_stage("HEADLINE bc1 kernels", stage_headline, cost_s=0, required=True)

    # ---- EVIDENCE stages next: parity, ratio, CLI (the round-3 budget starved
    # these; perf detail stages now run after them) ----
    def stage_parity():
        from dxt_lossless_transform_tpu.utils import parity

        if on_tpu:
            _details["parity_quick"] = parity.run(parity.quick_combos())

    run_stage("kernel parity (quick)", stage_parity, cost_s=30)

    # compression ratio, realistic corpus (photo/normal/flat/tiled/terrain
    # families with full mip chains; the full corpus study lives in
    # CORPUS_REPORT.md). Host-side stage: small payloads take the native path.
    def stage_ratio():
        import zstandard as _z

        from dxt_lossless_transform_tpu.estimate import ZstdEstimation as _ZE
        from dxt_lossless_transform_tpu.ops import auto as _auto
        from dxt_lossless_transform_tpu.settings import Bc1TransformSettings
        from dxt_lossless_transform_tpu.ops import bc1 as _ops_bc1
        from dxt_lossless_transform_tpu.utils import corpus as _corpus
        from dxt_lossless_transform_tpu.utils.encode import encode_bc1

        cctx16 = _z.ZstdCompressor(level=16)
        est1 = _ZE(1)
        plain_total = default_total = auto_total = 0
        n_files = 0
        for _family, mips in _corpus.build_realistic_corpus(
                12, sizes=(256, 512, 1024)):
            payload = _corpus.encode_mips(
                mips, lambda im: encode_bc1(im[..., :3]))
            default = _ops_bc1.transform(payload, Bc1TransformSettings())
            out, _ = _auto.transform_bc1_auto(payload, est1,
                                              use_all_decorrelation_modes=True)
            plain_total += len(cctx16.compress(payload))
            default_total += len(cctx16.compress(default))
            auto_total += len(cctx16.compress(out))
            n_files += 1
        _details["corpus_ratio"] = {
            "corpus": f"{n_files} realistic textures (photo/normal/flat/tiled/"
                      "terrain, 256-1024 px, full mip chains; full study: "
                      "CORPUS_REPORT.md)",
            "plain_zstd16": plain_total,
            "default_zstd16": default_total,
            "transformed_zstd16": auto_total,
            "reduction_pct": round(100.0 * (1 - auto_total / plain_total), 2),
        }

    run_stage("corpus ratio", stage_ratio, cost_s=35)

    # ---- ratio parity on the reference corpus asset (if mounted) ----
    def stage_ratio_ref():
        import zstandard

        from dxt_lossless_transform_tpu.estimate import ZstdEstimation
        from dxt_lossless_transform_tpu.formats.debug import extract_blocks_from_dds
        from dxt_lossless_transform_tpu.ops import auto as ops_auto

        path = "/root/reference/src/assets/tests/r2-256-bc1.dds"
        if not os.path.exists(path):
            return
        raw = open(path, "rb").read()
        ex = extract_blocks_from_dds(raw)
        cctx = zstandard.ZstdCompressor(level=16)
        out, _ = ops_auto.transform_bc1_auto(ex.data, ZstdEstimation(1),
                                             use_all_decorrelation_modes=True)
        _details["ratio_check"] = {
            "plain_zstd16": len(cctx.compress(ex.data)),
            "transformed_zstd16": len(cctx.compress(out)),
        }

    run_stage("ratio check (reference asset)", stage_ratio_ref, cost_s=8)

    # ---- real-encoder BC7 evidence (driver-captured): candidate win counts +
    # identity rate on multi-mode-encoded DX10 containers (utils/bc7codec;
    # the full >=100-file study lives in CORPUS_REPORT.md) ----
    def stage_bc7_real():
        import zstandard as _z

        from dxt_lossless_transform_tpu.oracle import bc7 as obc7
        from dxt_lossless_transform_tpu.settings import Bc7TransformSettings
        from dxt_lossless_transform_tpu.utils.corpus import build_bc7_dds_corpus

        cctx = _z.ZstdCompressor(level=16)
        cand = tuple(Bc7TransformSettings.all_combinations())
        wins = {}
        plain_total = best_total = 0
        mode_hist = {}
        for _name, dds, hist in build_bc7_dds_corpus(8, sizes=(128,),
                                                     seed0=71000):
            for m, c in hist.items():
                mode_hist[m] = mode_hist.get(m, 0) + c
            payload = dds[0x94:]
            p = len(cctx.compress(payload))
            sizes = [len(cctx.compress(obc7.transform(payload, s)))
                     for s in cand]
            besti = int(np.argmin(sizes))
            if p <= sizes[besti]:
                wins["identity"] = wins.get("identity", 0) + 1
                best = p
            else:
                key = f"sort={cand[besti].sort_by_mode}," \
                      f"planes={cand[besti].split_byte_planes}"
                wins[key] = wins.get(key, 0) + 1
                best = sizes[besti]
            plain_total += p
            best_total += best
        _details["bc7_real_encoder"] = {
            "files": 8, "encoder": "utils/bc7codec multi-mode least-error",
            "plain_zstd16": plain_total, "best_zstd16": best_total,
            "best_reduction_pct": round(100.0 * (1 - best_total / plain_total),
                                        2),
            "win_distribution": wins,
            "mode_histogram": {str(k): v for k, v in sorted(mode_hist.items())},
        }

    run_stage("bc7 real-encoder evidence", stage_bc7_real, cost_s=15)

    # ---- CLI batch pipeline vs per-file path on a many-small-files tree
    # (reference analog: the rayon-parallel production path,
    # commands/transform/mod.rs:166-187). Rows cover the medium (device-LTU)
    # AND optimal (device regions + native pthread zstd) presets. ----
    def stage_cli_batch():
        import shutil
        import tempfile

        from dxt_lossless_transform_tpu.cli.main import main as cli_main
        from dxt_lossless_transform_tpu.utils import testgen

        # tmpfs when available: this stage measures the framework's dispatch
        # overhead at 8 KiB/file, and on this host's virtio disk the page-cache
        # flush noise exceeds the whole measured quantity (~2x run-to-run).
        root = tempfile.mkdtemp(
            prefix="dlt_bench_cli_",
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
        try:
            src = os.path.join(root, "in")
            os.makedirs(src)
            n_files = 96
            total = 0
            for i in range(n_files):
                blob = testgen.make_dds("BC1", 128, 128, mipmaps=1, seed=i)
                total += len(blob)
                with open(os.path.join(src, f"t{i:03d}.dds"), "wb") as f:
                    f.write(blob)
            rows = {}
            for label, preset, flag, reps in (
                    ("medium_batched", "medium", "--batch", 2),
                    ("medium_per_file", "medium", "--no-batch", 2),
                    ("optimal_batched", "optimal", "--batch", 2),
                    ("optimal_per_file", "optimal", "--no-batch", 2)):
                best = None
                for rep in range(reps):  # best-of-N damps warmup jitter
                    out = os.path.join(root, f"{label}{rep}")
                    t0 = time.perf_counter()
                    with contextlib.redirect_stdout(io.StringIO()):
                        # bench stdout stays exactly one JSON line
                        rc = cli_main(["transform", src, out, "--preset",
                                       preset, flag])
                    dt = time.perf_counter() - t0
                    if rc == 0 and (best is None or dt < best):
                        best = dt
                if best is not None:
                    rows[label] = {"files_per_s": round(n_files / best, 1),
                                   "MiBps": round(total / best / (1 << 20), 1)}
            _details["cli_tree_96x128px"] = rows

            # ---- the LOAD path: untransform the transformed tree, batched vs
            # per-file (reference headline: bc1-api/README.MD:286-313) ----
            tsrc = os.path.join(root, "medium_batched0")
            for label, flag in (("untransform_batched", "--batch"),
                                ("untransform_per_file", "--no-batch")):
                best = None
                for rep in range(2):
                    out = os.path.join(root, f"{label}{rep}")
                    t0 = time.perf_counter()
                    with contextlib.redirect_stdout(io.StringIO()):
                        rc = cli_main(["untransform", tsrc, out, flag])
                    dt = time.perf_counter() - t0
                    if rc == 0 and (best is None or dt < best):
                        best = dt
                if best is not None:
                    rows[label] = {"files_per_s": round(n_files / best, 1),
                                   "MiBps": round(total / best / (1 << 20), 1)}
            # restored tree must equal the source byte-for-byte
            with open(os.path.join(src, "t000.dds"), "rb") as f0, \
                    open(os.path.join(root, "untransform_batched0",
                                      "t000.dds"), "rb") as f1:
                assert f0.read() == f1.read(), "untransform mismatch"

        finally:
            shutil.rmtree(root, ignore_errors=True)

    run_stage("cli batch pipeline", stage_cli_batch, cost_s=55)

    # ---- corpus-scale CLI: 300 files / ~250 MB through the streaming batch
    # path in a SUBPROCESS (clean peak-RSS measurement; the huge device
    # threshold keeps the child off the relay chip -- the native C++ path owns
    # this regime). Evidence for the DLT_STREAM_BYTES bound: peak RSS stays at
    # imports + ~one window, not the corpus size
    # (reference scale: 2,130 files / 8.5 GiB, bc1-api/README.MD:236-252). ----
    def stage_cli_corpus():
        import shutil
        import subprocess
        import tempfile

        from dxt_lossless_transform_tpu.utils import testgen

        root = tempfile.mkdtemp(prefix="dlt_bench_corpus_")
        try:
            src = os.path.join(root, "in")
            os.makedirs(src)
            n_files, total = 300, 0
            for i in range(n_files):
                fmt, size = (("BC1", 2048), ("BC2", 1024), ("BC3", 1024))[i % 3]
                blob = testgen.make_dds(fmt, size, size, mipmaps=1, seed=i)
                total += len(blob)
                with open(os.path.join(src, f"c{i:03d}.dds"), "wb") as f:
                    f.write(blob)
            window = 32 << 20
            env = dict(os.environ, DLT_DEVICE_MIN_BYTES=str(1 << 30),
                       DLT_MEDIUM_BATCH_NATIVE="1",  # child must not touch the
                       DLT_STREAM_BYTES=str(window))  # single-process relay chip
            # NOTE: ru_maxrss inherits the parent's resident pages across
            # fork(), so a child of this (large) bench process would report the
            # bench's RSS; VmHWM resets at execve and measures the child alone.
            wrapper = (
                "import sys\n"
                "def hwm():\n"
                "    with open('/proc/self/status') as f:\n"
                "        for line in f:\n"
                "            if line.startswith('VmHWM:'):\n"
                "                return int(line.split()[1])\n"
                "    return 0\n"
                "from dxt_lossless_transform_tpu.cli.main import main\n"
                "print('RSS0_KB', hwm(), file=sys.stderr)\n"
                "rc = main(sys.argv[1:])\n"
                "print('RSS_KB', hwm(), file=sys.stderr)\n"
                "sys.exit(rc)\n")

            def child(args):
                t0 = time.perf_counter()
                p = subprocess.run([sys.executable, "-c", wrapper, *args],
                                   env=env, capture_output=True, text=True)
                dt = time.perf_counter() - t0
                rss = rss0 = None
                for line in p.stderr.splitlines():
                    if line.startswith("RSS0_KB "):
                        rss0 = int(line.split()[1]) / 1024.0
                    elif line.startswith("RSS_KB "):
                        rss = int(line.split()[1]) / 1024.0
                return p.returncode, dt, (rss0, rss)

            # baseline: imports + walk of an empty dir (rc nonzero, fine);
            # its wall time is the child's fixed startup cost
            empty = os.path.join(root, "empty")
            os.makedirs(empty)
            _, dt_base, _ = child(["transform", empty, empty,
                                   "--preset", "medium"])
            out = os.path.join(root, "out")
            rc_t, dt_t, rss_t = child(["transform", src, out, "--preset",
                                       "medium"])
            back = os.path.join(root, "back")
            rc_u, dt_u, rss_u = child(["untransform", out, back])
            with open(os.path.join(src, "c000.dds"), "rb") as f0, \
                    open(os.path.join(back, "c000.dds"), "rb") as f1:
                assert f0.read() == f1.read(), "corpus untransform mismatch"
            # contrast run: windowing disabled -> the processing delta over the
            # child's own import RSS grows with the corpus, evidencing that
            # DLT_STREAM_BYTES is what bounds the peak
            env["DLT_STREAM_BYTES"] = str(1 << 40)
            out_nw = os.path.join(root, "out_nw")
            rc_nw, dt_nw, rss_nw = child(["transform", src, out_nw,
                                          "--preset", "medium"])
            env["DLT_STREAM_BYTES"] = str(window)

            def row(rc, dt, rss):
                work = max(dt - dt_base, 1e-9)
                rss0, rss1 = rss
                return {"rc": rc, "wall_s": round(dt, 1),
                        "startup_s": round(dt_base, 1),
                        "MiBps_ex_startup": round(total / work / (1 << 20), 1),
                        "files_per_s_ex_startup": round(n_files / work, 1),
                        "import_rss_MiB": round(rss0 or 0, 1),
                        "peak_rss_MiB": round(rss1 or 0, 1),
                        "processing_delta_MiB": round((rss1 or 0)
                                                      - (rss0 or 0), 1)}

            _details["cli_corpus_300files"] = {
                "files": n_files, "MiB": round(total / (1 << 20), 1),
                "stream_window_MiB": window >> 20,
                "transform": row(rc_t, dt_t, rss_t),
                "untransform": row(rc_u, dt_u, rss_u),
                "unwindowed_transform": row(rc_nw, dt_nw, rss_nw),
                "note": "native C++ path (huge device threshold); windowed "
                        "peak RSS = imports + ~one stream window regardless of "
                        "corpus size; the unwindowed contrast holds whole "
                        "format groups in RAM",
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)

    run_stage("cli corpus scale", stage_cli_corpus, cost_s=75)

    # ---- perf details: other formats (shared payload; no re-upload) ----
    def stage_fmt(name, mod):
        def run():
            words = shared["words"]
            if name == "bc3":
                fwd = lambda w: mod.transform_device(w, 1, True, True)
                inv = lambda s: mod.untransform_device(s, 1, True, True)
            else:
                fwd = lambda w: mod.transform_device(w, 1, True)
                inv = lambda s: mod.untransform_device(s, 1, True)
            streams = fwd(words)
            entry = {
                "transform_single_dispatch_GBps": nbytes / _bench(fwd, words) / 1e9,
                "untransform_single_dispatch_GBps":
                    nbytes / _bench(inv, streams) / 1e9,
            }
            if on_tpu:
                t_rt = _bench(_chain(name), words, iters=5, trials=TRIALS)
                entry["roundtrip_sustained_GBps"] = nbytes * CHAIN_K / t_rt / 1e9
            results[name] = entry
        return run

    run_stage("kernels: bc2", stage_fmt("bc2", bc2), cost_s=12)
    run_stage("kernels: bc3", stage_fmt("bc3", bc3), cost_s=12)

    def stage_bc45(name):
        def run():
            if not on_tpu:
                return
            t_rt = _bench(_chain(name), shared["words"], iters=5, trials=TRIALS)
            results[name] = {
                "roundtrip_sustained_GBps": nbytes * CHAIN_K / t_rt / 1e9}
        return run

    run_stage("kernels: bc4", stage_bc45("bc4"), cost_s=8)
    run_stage("kernels: bc5", stage_bc45("bc5"), cost_s=8)


    # ---- auto-search throughputs (shared payload) ----
    # reference baselines: BC1 LTU auto ~1018 MiB/s (bc1/transform/mod.rs:34),
    # BC2 ~2036 MiB/s (bc2-api/README.MD:53), BC3 ~678 MiB/s
    # (bc3/src/transform/transform_auto.rs:100)
    def stage_auto(name):
        from dxt_lossless_transform_tpu.parallel import sharded as _sh

        step = {"bc1": _sh.bc1_auto_step_single, "bc2": _sh.bc2_auto_step_single,
                "bc3": _sh.bc3_auto_step_single}[name]

        def run():
            t_auto = _bench(lambda f: step(f), shared["words"], iters=10)
            _details[f"{name}_auto_transform_MiBps"] = nbytes / t_auto / (1 << 20)
        return run

    run_stage("auto-search bc1", stage_auto("bc1"), cost_s=12)
    run_stage("auto-search bc2", stage_auto("bc2"), cost_s=12)
    run_stage("auto-search bc3", stage_auto("bc3"), cost_s=12)

    def stage_auto_batched():
        from dxt_lossless_transform_tpu.parallel.sharded import (
            auto_step_batched, _BC1_CANDIDATES)

        B = 16
        nb = nbytes // 8 // B
        flats = shared["words"].reshape(B, 2 * nb)
        valid = jnp.asarray(np.full((B,), 4 * nb), jnp.int32)
        step = auto_step_batched("bc1", _BC1_CANDIDATES, full=True)
        t_b = _bench(step, flats, valid, iters=10)
        _details["bc1_batched_auto_MiBps"] = B * nb * 8 / t_b / (1 << 20)

    run_stage("batched auto step", stage_auto_batched, cost_s=18)

    # ---- mesh(1,1) batched auto: the sharded step's words path on the chip ----
    def stage_auto_mesh():
        from dxt_lossless_transform_tpu.parallel.mesh import make_mesh
        from dxt_lossless_transform_tpu.parallel.sharded import (
            bc1_auto_step, _BC1_CANDIDATES)

        if not on_tpu:
            return
        mesh = make_mesh(1)
        B = 16
        nb = nbytes // 8 // B
        flats = shared["words"].reshape(B, 2 * nb)
        valid = jnp.asarray(np.full((B,), 4 * nb), jnp.int32)
        step = bc1_auto_step(mesh, _BC1_CANDIDATES, full=True)
        t_b = _bench(step, flats, valid, iters=10)
        _details["bc1_batched_auto_mesh_MiBps"] = B * nb * 8 / t_b / (1 << 20)

    run_stage("batched auto step (mesh)", stage_auto_mesh, cost_s=18)

    # ---- zstd-preset auto-search (host path: native C++ region builders +
    # task-parallel pthread estimation; reference: 265 MiB/s 1T on a 9950X3D,
    # bc1/src/transform/mod.rs:33) ----
    def stage_auto_zstd():
        from dxt_lossless_transform_tpu.estimate import ZstdEstimation
        from dxt_lossless_transform_tpu.ops import auto as _a
        from dxt_lossless_transform_tpu.utils import testgen
        from dxt_lossless_transform_tpu import runtime

        data = testgen.bc1_realistic(2 << 20, seed=7)  # 16 MiB
        est = ZstdEstimation(1)
        _a.transform_bc1_auto(data, est)  # warm
        t0 = time.perf_counter()
        _a.transform_bc1_auto(data, est)
        auto_rate = len(data) / (time.perf_counter() - t0) / (1 << 20)
        _details["bc1_auto_zstd_MiBps"] = auto_rate
        # Host-CPU calibration: this environment's single-thread magicless zstd-L1
        # rate. The reference rig's implied rate is ~1060 MB/s (README.MD:55-68);
        # the NORMALIZED ratio auto/zstd1 makes the host-speed-adjusted claim
        # directly (reference: 265/1060 = 0.25).
        if runtime.available():
            region = data[:len(data) // 2]
            t0 = time.perf_counter()
            runtime.zstd_estimate(region, 1)
            zstd1 = len(region) / (time.perf_counter() - t0) / (1 << 20)
            _details["zstd1_single_thread_MiBps"] = zstd1
            _details["bc1_auto_zstd_normalized"] = {
                "auto_over_zstd1": round(auto_rate / zstd1, 3),
                "reference_auto_over_zstd1": round(265.0 / 1060.0, 3),
            }

    run_stage("zstd auto-search (host)", stage_auto_zstd, cost_s=12)

    # ---- BC7 mode-aware kernel (framework extension) ----
    def stage_bc7():
        from dxt_lossless_transform_tpu.ops import bc7 as ops_bc7

        nblk = nbytes // 16
        words7 = shared["words"]           # 4*nblk words == the shared buffer
        results["bc7"] = {}
        for label, sort7 in (("sort_planes", True), ("planes_only", False)):
            fwd7 = lambda w: ops_bc7.transform_device(w, nblk, sort7, True)
            planes, stream = fwd7(words7)
            sraw = np.asarray(stream)  # unpack nibbles (low first) as untransform does
            m_np = np.empty(2 * len(sraw), np.uint8)
            m_np[0::2] = sraw & 0x0F
            m_np[1::2] = sraw >> 4
            modes7 = jnp.asarray(m_np)
            inv7 = lambda p: ops_bc7.untransform_device(p, modes7, nblk, sort7, True)
            t_fwd = _bench(fwd7, words7, iters=10, trials=TRIALS)
            t_inv = _bench(inv7, planes, iters=10, trials=TRIALS)
            results["bc7"][label] = {
                "transform_GBps": nbytes / t_fwd / 1e9,
                "untransform_GBps": nbytes / t_inv / 1e9,
                "roundtrip_GBps": nbytes / (t_fwd + t_inv) / 1e9,
            }

    run_stage("kernels: bc7", stage_bc7, cost_s=25)

    _stage_log("done")
    _finalize()


if __name__ == "__main__":
    main()
