"""CLI tests: flag parsing, exit codes, end-to-end runs on a tiny checkpoint."""

import io
import os
import struct

import numpy as np
import pytest
import torch
from PIL import Image

from matrix_eyes_tpu import cli
from matrix_eyes_tpu.config import TINY

import torch_ref


# --- parsing ----------------------------------------------------------------

def _parse(argv):
    return cli.parse_args(argv, stdout=io.StringIO(), stderr=io.StringIO())


def test_parse_defaults():
    a = _parse(["in.jpg", "out.png"])
    assert a.img_src == "in.jpg" and a.img_out == "out.png"
    assert a.checkpoint_path == "./checkpoints/depth_pro.pt"
    assert a.output_format == "depthmap"
    assert a.vertex_mode == "vertex-colors"
    assert a.stereo_amplitude == 1.0 / 16.0
    assert a.resize_scale is None
    assert a.focal_length is None


def test_parse_all_flags():
    a = _parse([
        "--focal-length=28", "--checkpoint-path=/tmp/c.pt",
        "--image-output-format=stereogram", "--resize-scale=2.0",
        "--stereo-amplitude=0.1", "--mesh=texture-coordinates",
        "--convert-checkpoints", "in.jpg", "out.png",
    ])
    assert a.focal_length == 28.0
    assert a.checkpoint_path == "/tmp/c.pt"
    assert a.output_format == "stereogram"
    assert a.resize_scale == 2.0
    assert a.stereo_amplitude == 0.1
    assert a.vertex_mode == "texture-coordinates"
    assert a.convert_checkpoints


def test_parse_exit_codes():
    with pytest.raises(SystemExit) as e:
        _parse(["--help"])
    assert e.value.code == 0
    for argv in (
        [],  # no source image
        ["only_src.jpg"],  # no output image
        ["a", "b", "c"],  # unexpected positional
        ["--focal-length", "a", "b"],  # flag without value
        ["--focal-length=abc", "a", "b"],  # bad value
        ["--image-output-format=bmp", "a", "b"],  # bad format
        ["--mesh=wireframe", "a", "b"],  # bad mesh mode
    ):
        with pytest.raises(SystemExit) as e:
            _parse(argv)
        assert e.value.code == 2, argv


def test_parse_devices():
    assert _parse(["--devices=8", "a", "b"]).devices == (8, 1)
    assert _parse(["--devices=4x2", "a", "b"]).devices == (4, 2)
    assert _parse(["--devices=1", "a", "b"]).devices == (1, 1)
    for bad in ("0", "axb", "3x", "2x2x2", "-4x2"):
        with pytest.raises(SystemExit) as e:
            _parse([f"--devices={bad}", "a", "b"])
        assert e.value.code == 2, bad


def test_parse_unknown_flag_warns_but_continues():
    # main.rs:117-119: unsupported flags only warn
    err = io.StringIO()
    a = cli.parse_args(["--bogus=1", "in.jpg", "out.png"], stdout=io.StringIO(), stderr=err)
    assert a.img_src == "in.jpg"
    assert "Unsupported argument" in err.getvalue()


def test_parse_flags_after_positional_are_positional():
    # options are only recognised before the first positional (main.rs:51)
    with pytest.raises(SystemExit) as e:
        _parse(["in.jpg", "out.png", "--focal-length=28"])
    assert e.value.code == 2


# --- end-to-end -------------------------------------------------------------

@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=5)
    ckpt = d / "tiny.pt"
    torch.save(tm.state_dict(), str(ckpt))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(40, 60, 3), dtype=np.uint8)
    src = d / "src.jpg"
    Image.fromarray(img).save(str(src), quality=95)
    return d, str(ckpt), str(src)


def _run(argv):
    return cli.main(argv)


def test_cli_depthmap_png(workdir):
    d, ckpt, src = workdir
    out = str(d / "depth.png")
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28", src, out])
    assert rc == 0
    with Image.open(out) as im:
        assert im.format == "PNG"
        assert im.size == (60, 40)  # original size restored


def test_cli_stereogram(workdir):
    d, ckpt, src = workdir
    out = str(d / "stereo.png")
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               "--image-output-format=stereogram", "--resize-scale=1.5", src, out])
    assert rc == 0
    with Image.open(out) as im:
        assert im.size == (90, 60)  # 1.5x


def test_cli_fov_path(workdir):
    # no focal length and no EXIF -> FOV head path
    d, ckpt, src = workdir
    out = str(d / "depth_fov.png")
    rc = _run([f"--checkpoint-path={ckpt}", src, out])
    assert rc == 0
    assert os.path.exists(out)


def test_cli_obj_mesh(workdir):
    d, ckpt, src = workdir
    out = str(d / "mesh.obj")
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28", "--mesh=plain", src, out])
    assert rc == 0
    text = open(out).read()
    assert text.startswith("v ") or text.startswith("f ")
    assert "\nf " in text
    assert "vt" not in text
    assert "e" not in text.split("\n")[0].split(" ", 1)[1]  # no exponent floats


def test_cli_obj_texture_mesh_writes_mtl(workdir):
    d, ckpt, src = workdir
    out = str(d / "tex.obj")
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               "--mesh=texture-coordinates", src, out])
    assert rc == 0
    text = open(out).read()
    assert text.startswith("mtllib tex.mtl\nusemtl Textured\n")
    assert "\nvt " in text
    mtl = open(str(d / "tex.mtl")).read()
    assert "newmtl Textured" in mtl and f"map_Kd {src}" in mtl


def test_cli_ply_mesh_binary_layout(workdir):
    d, ckpt, src = workdir
    out = str(d / "mesh.ply")
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28", src, out])
    assert rc == 0
    raw = open(out, "rb").read()
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:header_end].decode()
    assert header.startswith("ply\nformat binary_big_endian 1.0\n")
    assert "property double x" in header
    assert "property uchar red" in header  # default mesh mode = vertex-colors
    nv = int(header.split("element vertex ")[1].split("\n")[0])
    nf = int(header.split("element face ")[1].split("\n")[0])
    body = raw[header_end:]
    vertex_bytes = nv * (3 * 8 + 3)
    face_bytes = nf * (1 + 3 * 4)
    assert len(body) == vertex_bytes + face_bytes
    # first face: uchar count == 3, big-endian u32 indices < nv
    n, i0, i1, i2 = struct.unpack_from(">BIII", body, vertex_bytes)
    assert n == 3 and max(i0, i1, i2) < nv


def test_cli_convert_checkpoints_caches(workdir):
    d, ckpt, src = workdir
    out = str(d / "cached.png")
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               "--convert-checkpoints", src, out])
    assert rc == 0
    stem = os.path.splitext(ckpt)[0]
    for part in ("encoder", "decoder", "head"):
        assert os.path.exists(f"{stem}-{part}.npz"), part
    assert os.path.exists(f"{stem}-config.json")
    # caches alone are enough: hide the .pt and run again
    os.rename(ckpt, ckpt + ".hidden")
    try:
        rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28", src, out])
        assert rc == 0
    finally:
        os.rename(ckpt + ".hidden", ckpt)


def test_cli_missing_checkpoint_fails_with_1(workdir):
    d, _, src = workdir
    rc = _run([f"--checkpoint-path={d}/nope.pt", "--focal-length=28",
               src, str(d / "x.png")])
    assert rc == 1


def test_cli_missing_image_fails_with_1(workdir):
    d, ckpt, _ = workdir
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               str(d / "missing.jpg"), str(d / "x.png")])
    assert rc == 1


def test_cli_batch_directory_mode(workdir, tmp_path):
    d, ckpt, src = workdir
    import shutil

    srcdir = tmp_path / "in"
    outdir = tmp_path / "out"
    srcdir.mkdir()
    outdir.mkdir()
    shutil.copy(src, str(srcdir / "a.jpg"))
    shutil.copy(src, str(srcdir / "b.jpg"))
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               str(srcdir), str(outdir)])
    assert rc == 0
    assert (outdir / "a.png").exists() and (outdir / "b.png").exists()


def test_cli_batch_prefetch_matches_single(workdir, tmp_path):
    """Batch mode decode-ahead (image k+1 decoded on a worker thread while
    image k computes) must produce byte-identical outputs to one-image-per-
    invocation runs."""
    d, ckpt, src = workdir
    import shutil

    srcdir = tmp_path / "in_pf"
    outdir = tmp_path / "out_pf"
    srcdir.mkdir()
    outdir.mkdir()
    for name in ("a.jpg", "b.jpg", "c.jpg"):
        shutil.copy(src, str(srcdir / name))
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               str(srcdir), str(outdir)])
    assert rc == 0

    single = tmp_path / "single_pf.png"
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               str(srcdir / "b.jpg"), str(single)])
    assert rc == 0
    assert (outdir / "b.png").read_bytes() == single.read_bytes()


def test_cli_batch_prefetch_decode_error_is_canonical(workdir, tmp_path, capsys):
    """A corrupt image decoded by the prefetch thread must fail with the
    pipeline's own per-stage message (the prefetch falls back to an inline
    decode so error reporting is unchanged)."""
    d, ckpt, src = workdir
    import shutil

    srcdir = tmp_path / "in_bad"
    outdir = tmp_path / "out_bad"
    srcdir.mkdir()
    outdir.mkdir()
    shutil.copy(src, str(srcdir / "a.jpg"))
    (srcdir / "b.jpg").write_bytes(b"not a jpeg")
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               str(srcdir), str(outdir)])
    assert rc == 1
    assert (outdir / "a.png").exists()  # first image still produced
    assert "Failed to load source image" in capsys.readouterr().err


def test_cli_devices_mesh_matches_single_device(workdir, tmp_path):
    """--devices=4x2 runs the full pipeline sharded over the virtual 8-device
    mesh (patch batch over 'data', Megatron TP over 'model'); the depth map
    must match the single-device run up to reduction-reorder noise (<= 1 u8
    quantisation level after the (max-d)/(max-min) normalisation)."""
    d, ckpt, src = workdir
    single = str(tmp_path / "single.png")
    sharded = str(tmp_path / "sharded.png")
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28", src, single])
    assert rc == 0
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               "--devices=4x2", src, sharded])
    assert rc == 0
    with Image.open(single) as a, Image.open(sharded) as b:
        assert a.size == b.size == (60, 40)
        pa = np.asarray(a).astype(np.int16)
        pb = np.asarray(b).astype(np.int16)
    assert np.abs(pa - pb).max() <= 1


def test_cli_devices_stereogram_and_batch(workdir, tmp_path):
    """The mesh path covers the FOV-head route and batch-directory mode."""
    d, ckpt, src = workdir
    import shutil

    srcdir = tmp_path / "in_mesh"
    outdir = tmp_path / "out_mesh"
    srcdir.mkdir()
    outdir.mkdir()
    shutil.copy(src, str(srcdir / "a.jpg"))
    shutil.copy(src, str(srcdir / "b.jpg"))
    # no focal length: FOV network runs sharded too
    rc = _run([f"--checkpoint-path={ckpt}", "--devices=4x2",
               "--image-output-format=stereogram", str(srcdir), str(outdir)])
    assert rc == 0
    assert (outdir / "a.png").exists() and (outdir / "b.png").exists()


def test_cli_devices_too_many_fails_with_1(workdir, tmp_path):
    d, ckpt, src = workdir
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               "--devices=64", src, str(tmp_path / "never.png")])
    assert rc == 1


def test_cli_batch_requires_out_directory(workdir, tmp_path):
    d, ckpt, src = workdir
    import shutil

    srcdir = tmp_path / "in2"
    srcdir.mkdir()
    shutil.copy(src, str(srcdir / "a.jpg"))
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               str(srcdir), str(tmp_path / "not_a_dir.png")])
    assert rc == 1


def _exif_jpeg(path, focal_35mm=None):
    rng = np.random.RandomState(7)
    img = Image.fromarray(rng.randint(0, 256, size=(40, 60, 3), dtype=np.uint8))
    if focal_35mm is None:
        img.save(path, quality=95)
    else:
        exif = Image.Exif()
        exif[0xA405] = focal_35mm
        img.save(path, quality=95, exif=exif)


def test_probe_focal_length_header_only(tmp_path):
    from matrix_eyes_tpu.io.image import probe_focal_length_35mm

    with_exif = str(tmp_path / "e.jpg")
    without = str(tmp_path / "n.jpg")
    _exif_jpeg(with_exif, 28)
    _exif_jpeg(without)
    assert probe_focal_length_35mm(with_exif) == 28.0
    assert probe_focal_length_35mm(without) is None
    assert probe_focal_length_35mm(str(tmp_path / "missing.jpg")) is None


@pytest.mark.parametrize("all_exif", [True, False])
def test_cli_batch_fov_lazy_load(workdir, tmp_path, monkeypatch, all_exif):
    """Batch mode probes EXIF up front and loads the FOV network only when
    some image actually lacks a focal length (mod.rs:340-359 lazy intent)."""
    d, ckpt, _src = workdir
    srcdir = tmp_path / f"in_lazy_{all_exif}"
    outdir = tmp_path / f"out_lazy_{all_exif}"
    srcdir.mkdir()
    outdir.mkdir()
    _exif_jpeg(str(srcdir / "a.jpg"), 28)
    _exif_jpeg(str(srcdir / "b.jpg"), 35 if all_exif else None)

    import matrix_eyes_tpu.pt.loader as loader_mod

    seen = {}
    real = loader_mod.load_checkpoint

    def spy(*a, **k):
        seen["parts"] = tuple(k.get("parts", ()))
        return real(*a, **k)

    monkeypatch.setattr(loader_mod, "load_checkpoint", spy)
    rc = _run([f"--checkpoint-path={ckpt}", str(srcdir), str(outdir)])
    assert rc == 0
    assert ("fov" in seen["parts"]) == (not all_exif)
    assert (outdir / "a.png").exists() and (outdir / "b.png").exists()


# --- batched forwards (--batch-size) ----------------------------------------

def test_parse_batch_size():
    assert _parse(["a", "b"]).batch_size == 1
    assert _parse(["--batch-size=4", "a", "b"]).batch_size == 4
    for bad in ("0", "-2", "x", "1.5"):
        with pytest.raises(SystemExit) as e:
            _parse([f"--batch-size={bad}", "a", "b"])
        assert e.value.code == 2, bad


def _varied_dir(tmp_path, name, n, focals=None):
    """n distinct images (different content AND sizes) under tmp_path/name."""
    srcdir = tmp_path / name
    srcdir.mkdir()
    for i in range(n):
        rng = np.random.RandomState(100 + i)
        img = Image.fromarray(
            rng.randint(0, 256, size=(40 + 4 * i, 60 - 2 * i, 3), dtype=np.uint8))
        kw = {"quality": 95}
        if focals and focals[i] is not None:
            exif = Image.Exif()
            exif[0xA405] = focals[i]
            kw["exif"] = exif
        img.save(str(srcdir / f"img{i}.jpg"), **kw)
    return srcdir


@pytest.mark.parametrize("fmt", ["depthmap", "stereogram"])
def test_cli_batch_size_outputs_match_batch1(workdir, tmp_path, fmt):
    """--batch-size=2 over 3 images (so the last chunk is PADDED to the
    batch size) must write byte-identical files to the batch-1 loop: the
    batch axis is elementwise-independent through the whole network, and
    padding rows cannot leak into real rows."""
    d, ckpt, _src = workdir
    srcdir = _varied_dir(tmp_path, f"in_bs_{fmt}", 3)
    out1 = tmp_path / f"out_b1_{fmt}"
    out2 = tmp_path / f"out_b2_{fmt}"
    out1.mkdir()
    out2.mkdir()
    base = [f"--checkpoint-path={ckpt}", "--focal-length=28",
            f"--image-output-format={fmt}"]
    assert _run(base + [str(srcdir), str(out1)]) == 0
    assert _run(base + ["--batch-size=2", str(srcdir), str(out2)]) == 0
    for i in range(3):
        a = (out1 / f"img{i}.png").read_bytes()
        b = (out2 / f"img{i}.png").read_bytes()
        assert a == b, f"img{i} differs between batch-1 and batch-2 runs"


def test_cli_batch_size_mixed_exif(workdir, tmp_path):
    """Mixed per-image focal lengths in one chunk: known focals override the
    FOV estimate per image (forward_with_mixed_fnorm), and each image's
    output matches its own single-image run."""
    d, ckpt, _src = workdir
    srcdir = _varied_dir(tmp_path, "in_bs_mixed", 2, focals=[28, None])
    out1 = tmp_path / "out_bsm_1"
    out2 = tmp_path / "out_bsm_2"
    out1.mkdir()
    out2.mkdir()
    assert _run([f"--checkpoint-path={ckpt}", str(srcdir), str(out1)]) == 0
    assert _run([f"--checkpoint-path={ckpt}", "--batch-size=2",
                 str(srcdir), str(out2)]) == 0
    for i in range(2):
        assert (out1 / f"img{i}.png").read_bytes() == \
            (out2 / f"img{i}.png").read_bytes(), f"img{i} differs"


def test_cli_batch_size_composes_with_devices(workdir, tmp_path):
    """--batch-size=2 --devices=2x2: the image batch shards over the mesh's
    data axis; outputs match the unsharded batch run up to the mesh test
    suite's u8 quantisation tolerance."""
    d, ckpt, _src = workdir
    srcdir = _varied_dir(tmp_path, "in_bs_mesh", 2)
    out_plain = tmp_path / "out_bsd_plain"
    out_mesh = tmp_path / "out_bsd_mesh"
    out_plain.mkdir()
    out_mesh.mkdir()
    base = [f"--checkpoint-path={ckpt}", "--focal-length=28", "--batch-size=2"]
    assert _run(base + [str(srcdir), str(out_plain)]) == 0
    assert _run(base + ["--devices=2x2", str(srcdir), str(out_mesh)]) == 0
    for i in range(2):
        with Image.open(out_plain / f"img{i}.png") as a, \
                Image.open(out_mesh / f"img{i}.png") as b:
            assert a.size == b.size
            pa = np.asarray(a).astype(np.int16)
            pb = np.asarray(b).astype(np.int16)
        assert np.abs(pa - pb).max() <= 1


def test_cli_batch_size_decode_error_is_canonical(workdir, tmp_path, capsys):
    d, ckpt, _src = workdir
    srcdir = _varied_dir(tmp_path, "in_bs_bad", 1)
    (srcdir / "zz.jpg").write_bytes(b"not a jpeg")
    outdir = tmp_path / "out_bs_bad"
    outdir.mkdir()
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               "--batch-size=2", str(srcdir), str(outdir)])
    assert rc == 1
    err = capsys.readouterr().err
    assert "Failed to load source image" in err and "zz.jpg" in err


def test_cli_batch_size_error_flushes_finished_chunk(workdir, tmp_path, capsys):
    """Output writing runs one chunk behind the forward (pipeline overlap);
    a decode failure in chunk k+1 must still write chunk k's finished
    outputs before the error surfaces (extract_depth_batch flush_pending)."""
    d, ckpt, _src = workdir
    srcdir = _varied_dir(tmp_path, "in_bs_flush", 3)
    (srcdir / "zz.jpg").write_bytes(b"not a jpeg")  # sorts last -> chunk 1
    outdir = tmp_path / "out_bs_flush"
    outdir.mkdir()
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               "--batch-size=2", str(srcdir), str(outdir)])
    assert rc == 1
    err = capsys.readouterr().err
    assert "Failed to load source image" in err and "zz.jpg" in err
    # chunk 0 ([img0, img1]) had already finished its forward: flushed
    assert (outdir / "img0.png").exists() and (outdir / "img1.png").exists()


def test_cli_batch_size_keep_going_isolates_bad_image(workdir, tmp_path, capsys):
    """Per-image failure isolation (the reference's one-process-per-image
    exit contract, main.rs:161-172): one corrupt file in the middle of a
    --batch-size run skips that image with the canonical stage message,
    the REST of the directory still completes, and the run exits 1 with
    a summary."""
    d, ckpt, _src = workdir
    srcdir = _varied_dir(tmp_path, "in_bs_kg", 4)
    (srcdir / "img1x.jpg").write_bytes(b"not a jpeg")  # sorts mid-run
    outdir = tmp_path / "out_bs_kg"
    outdir.mkdir()
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               "--batch-size=2", str(srcdir), str(outdir)])
    assert rc == 1
    cap = capsys.readouterr()
    assert "Failed to load source image" in cap.err and "img1x.jpg" in cap.err
    assert "1 of 5 images failed" in cap.out
    for i in range(4):
        assert (outdir / f"img{i}.png").exists(), i
    assert not (outdir / "img1x.png").exists()


def test_cli_batch_size_keep_going_isolates_output_error(workdir, tmp_path, capsys):
    """A per-image OUTPUT failure (unwritable destination) is isolated the
    same way: canonical message, remaining images complete, exit 1."""
    d, ckpt, _src = workdir
    srcdir = _varied_dir(tmp_path, "in_bs_kgo", 3)
    outdir = tmp_path / "out_bs_kgo"
    outdir.mkdir()
    (outdir / "img1.png").mkdir()  # write of img1's output must fail
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               "--batch-size=2", str(srcdir), str(outdir)])
    assert rc == 1
    cap = capsys.readouterr()
    assert "Failed to output result" in cap.err and "img1.png" in cap.err
    assert "1 of 3 images failed" in cap.out
    assert (outdir / "img0.png").is_file() and (outdir / "img2.png").is_file()


def test_cli_batch1_loop_keep_going(workdir, tmp_path, capsys):
    """The batch-size=1 directory loop has the same per-image isolation."""
    d, ckpt, _src = workdir
    srcdir = _varied_dir(tmp_path, "in_b1_kg", 3)
    (srcdir / "img0x.jpg").write_bytes(b"not a jpeg")
    outdir = tmp_path / "out_b1_kg"
    outdir.mkdir()
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               str(srcdir), str(outdir)])
    assert rc == 1
    cap = capsys.readouterr()
    assert "Failed to load source image" in cap.err and "img0x.jpg" in cap.err
    assert "1 of 4 images failed" in cap.out
    for i in range(3):
        assert (outdir / f"img{i}.png").exists(), i


def test_cli_batch1_loop_aborts_on_systemic_model_failure(
        workdir, tmp_path, capsys, monkeypatch):
    """A model-stage failure is systemic (device/weights), not per-image:
    the directory loop must abort on the FIRST one instead of retrying
    the failing forward on every remaining image (pipeline stage_error
    tags err.stage; cli.run isolates only load/output)."""
    d, ckpt, _src = workdir
    srcdir = _varied_dir(tmp_path, "in_b1_sys", 3)
    outdir = tmp_path / "out_b1_sys"
    outdir.mkdir()
    from matrix_eyes_tpu import aot

    calls = {"n": 0}
    orig = aot.call_cached

    def boom(name, fn, args, salt=""):
        if name.startswith("fwd"):
            calls["n"] += 1
            raise RuntimeError("device exploded")
        return orig(name, fn, args, salt=salt)

    monkeypatch.setattr(aot, "call_cached", boom)
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               str(srcdir), str(outdir)])
    assert rc == 1
    assert calls["n"] == 1, "systemic failure must abort, not retry per image"
    assert "Failed to process image" in capsys.readouterr().err


def test_cli_batch_size_ignored_for_single_file(workdir, tmp_path, capsys):
    d, ckpt, src = workdir
    out = str(tmp_path / "bs_single.png")
    rc = _run([f"--checkpoint-path={ckpt}", "--focal-length=28",
               "--batch-size=4", src, out])
    assert rc == 0
    assert os.path.exists(out)
    assert "--batch-size only applies" in capsys.readouterr().err
