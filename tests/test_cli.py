"""CLI end-to-end tests (in-process, CPU backend)."""

import pytest

from dxt_lossless_transform_tpu.cli.main import main
from dxt_lossless_transform_tpu.utils import testgen


@pytest.fixture()
def tree(tmp_path):
    src = tmp_path / "in"
    (src / "sub").mkdir(parents=True)
    (src / "a.dds").write_bytes(testgen.make_dds("BC1", 32, 32, seed=1))
    (src / "sub" / "b.dds").write_bytes(testgen.make_dds("BC3", 16, 16, seed=2))
    (src / "junk.txt").write_bytes(b"not a dds")
    return tmp_path


@pytest.mark.parametrize("preset", ["low", "medium"])
def test_cli_roundtrip_tree(tree, preset):
    src, out, back = tree / "in", tree / "out", tree / "back"
    rc = main(["transform", str(src), str(out), "--preset", preset])
    assert rc == 1  # junk.txt fails -> nonzero, but DDS files processed
    assert (out / "a.dds").exists() and (out / "sub" / "b.dds").exists()
    (out / "junk.txt").unlink(missing_ok=True)
    rc = main(["untransform", str(out), str(back)])
    assert rc == 0
    assert (back / "a.dds").read_bytes() == (src / "a.dds").read_bytes()
    assert (back / "sub" / "b.dds").read_bytes() == (src / "sub" / "b.dds").read_bytes()


def test_cli_single_file(tree):
    src = tree / "in" / "a.dds"
    out = tree / "single.t"
    back = tree / "single.dds"
    assert main(["transform", str(src), str(out), "--preset", "low"]) == 0
    assert main(["untransform", str(out), str(back)]) == 0
    assert back.read_bytes() == src.read_bytes()


def test_cli_debug_roundtrip(tree):
    assert main(["debug-bc1", "roundtrip", str(tree / "in")]) == 0


def test_cli_debug_stats(tree, tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    assert main(["debug-bc1", "calc-compression-stats", str(tree / "in"),
                 "--level", "3"]) == 0


def test_cli_batched_transform_matches_per_file(tree):
    """--batch groups BC1/BC3 files into device batches; outputs must round-trip
    and agree byte-for-byte with the per-file medium path."""
    src = tree / "in"
    out_b, out_f, back = tree / "outb", tree / "outf", tree / "backb"
    assert main(["transform", str(src), str(out_b), "--preset", "medium",
                 "--batch"]) == 1  # junk.txt still fails per-file
    assert main(["transform", str(src), str(out_f), "--preset", "medium",
                 "--no-batch"]) == 1
    for rel in ("a.dds", "sub/b.dds"):
        assert (out_b / rel).read_bytes() == (out_f / rel).read_bytes(), rel
    (out_b / "junk.txt").unlink(missing_ok=True)
    assert main(["untransform", str(out_b), str(back)]) == 0
    for rel in ("a.dds", "sub/b.dds"):
        assert (back / rel).read_bytes() == (src / rel).read_bytes(), rel


@pytest.mark.parametrize("preset", ["optimal", "max"])
def test_cli_batched_zstd_presets_match_per_file(tree, preset):
    """The zstd presets batch by default now (device-built candidate regions +
    native pthread batch estimation); outputs must agree byte-for-byte with the
    per-file path and round-trip."""
    src = tree / "in"
    out_b, out_f, back = tree / "outbz", tree / "outfz", tree / "backz"
    assert main(["transform", str(src), str(out_b), "--preset", preset]) == 1
    assert main(["transform", str(src), str(out_f), "--preset", preset,
                 "--no-batch"]) == 1
    for rel in ("a.dds", "sub/b.dds"):
        assert (out_b / rel).read_bytes() == (out_f / rel).read_bytes(), rel
    (out_b / "junk.txt").unlink(missing_ok=True)
    assert main(["untransform", str(out_b), str(back)]) == 0
    for rel in ("a.dds", "sub/b.dds"):
        assert (back / rel).read_bytes() == (src / rel).read_bytes(), rel


def test_cli_batched_bc7_dx10_tree(tmp_path):
    """BC7/BC6H DDS files (DX10 header) ride the medium batch pipeline and
    round-trip byte-exactly."""
    from dxt_lossless_transform_tpu.utils.testgen import make_dx10_dds

    src = tmp_path / "in7"
    src.mkdir()
    for i in range(4):
        (src / f"t{i}.dds").write_bytes(make_dx10_dds("BC7", 64, 64, seed=i))
    (src / "h.dds").write_bytes(make_dx10_dds("BC6H", 32, 32, seed=9))
    out, back = tmp_path / "out7", tmp_path / "back7"
    assert main(["transform", str(src), str(out), "--preset", "medium",
                 "--batch"]) == 0
    assert main(["untransform", str(out), str(back)]) == 0
    for f in src.iterdir():
        assert (back / f.name).read_bytes() == f.read_bytes(), f.name


def test_cli_batched_untransform_matches_per_file(tree, monkeypatch):
    """The load path: batched untransform (default) agrees byte-for-byte with
    --no-batch and restores the originals, with the device path forced on and
    streaming windows forced small (multiple flushes)."""
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", "4096")
    src = tree / "in"
    (src / "big.dds").write_bytes(testgen.make_dds("BC1", 128, 128, seed=5))
    (src / "big2.dds").write_bytes(testgen.make_dds("BC2", 128, 128, seed=6))
    out = tree / "outu"
    assert main(["transform", str(src), str(out), "--preset", "low"]) == 1
    (out / "junk.txt").unlink(missing_ok=True)

    import dxt_lossless_transform_tpu.cli.main as cli_main

    monkeypatch.setattr(cli_main, "_STREAM_WINDOW_BYTES", 1 << 12)
    back_b, back_f = tree / "backub", tree / "backuf"
    assert main(["untransform", str(out), str(back_b), "--batch",
                 "--max-batch", "2"]) == 0
    assert main(["untransform", str(out), str(back_f), "--no-batch"]) == 0
    for rel in ("a.dds", "sub/b.dds", "big.dds", "big2.dds"):
        assert (back_b / rel).read_bytes() == (back_f / rel).read_bytes(), rel
        assert (back_b / rel).read_bytes() == (src / rel).read_bytes(), rel


def test_cli_transform_stream_windows(tree, monkeypatch):
    """Transform batch path with tiny streaming windows: multiple flushes per
    format group still produce per-file-identical outputs."""
    import dxt_lossless_transform_tpu.cli.main as cli_main

    monkeypatch.setattr(cli_main, "_STREAM_WINDOW_BYTES", 1)  # flush every file
    src = tree / "in"
    out_w, out_f = tree / "outw", tree / "outwf"
    assert main(["transform", str(src), str(out_w), "--preset", "medium"]) == 1
    monkeypatch.setattr(cli_main, "_STREAM_WINDOW_BYTES", 256 << 20)
    assert main(["transform", str(src), str(out_f), "--preset", "medium"]) == 1
    for rel in ("a.dds", "sub/b.dds"):
        assert (out_w / rel).read_bytes() == (out_f / rel).read_bytes(), rel


def test_cli_untransform_corrupt_file_isolated(tree):
    """A corrupt transformed file fails with a typed error via the per-file
    fallback; healthy files in the same tree still restore byte-exactly."""
    src, out, back = tree / "in", tree / "outc", tree / "backc"
    assert main(["transform", str(src), str(out), "--preset", "low"]) == 1
    (out / "junk.txt").unlink(missing_ok=True)
    good = (out / "a.dds").read_bytes()
    # truncate a transformed file mid-payload: classification (st_size < end)
    # sends it to the per-file path, which raises a typed error
    (out / "a_trunc.dds").write_bytes(good[: len(good) // 2])
    rc = main(["untransform", str(out), str(back)])
    assert rc == 1  # the corrupt file is a recorded failure...
    assert not (back / "a_trunc.dds").exists()
    # ...and every healthy file restored regardless
    assert (back / "a.dds").read_bytes() == (src / "a.dds").read_bytes()
    assert (back / "sub" / "b.dds").read_bytes() == \
        (src / "sub" / "b.dds").read_bytes()


@pytest.mark.parametrize("preset", ["medium", "optimal"])
def test_cli_batched_rgb_tree(tmp_path, preset):
    """Uncompressed RGB(A) DDS files ride the batch pipeline under both auto
    presets, agree with the per-file path byte-for-byte, and round-trip."""
    from dxt_lossless_transform_tpu.utils.testgen import make_uncompressed_dds

    src = tmp_path / "inrgb"
    src.mkdir()
    for i, layout in enumerate(["rgba8888", "bgra8888", "bgr888", "rgba8888"]):
        (src / f"{layout}{i}.dds").write_bytes(
            make_uncompressed_dds(layout, 32, 24, seed=i))
    out_b, out_f, back = tmp_path / "outrgb", tmp_path / "outrgbf", tmp_path / "backrgb"
    assert main(["transform", str(src), str(out_b), "--preset", preset,
                 "--batch"]) == 0
    assert main(["transform", str(src), str(out_f), "--preset", preset,
                 "--no-batch"]) == 0
    for f in src.iterdir():
        assert (out_b / f.name).read_bytes() == (out_f / f.name).read_bytes(), f.name
    assert main(["untransform", str(out_b), str(back)]) == 0
    for f in src.iterdir():
        assert (back / f.name).read_bytes() == f.read_bytes(), f.name
