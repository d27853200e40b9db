"""HTTP serving front end (serve.py) on the tiny checkpoint: a real
ThreadingHTTPServer on an ephemeral port, driven with urllib -- the same
bytes a curl user would see."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
import torch
from PIL import Image

from matrix_eyes_tpu.api import MatrixEyes
from matrix_eyes_tpu.config import TINY
from matrix_eyes_tpu.serve import create_server

import torch_ref


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=21)
    ckpt = str(d / "tiny.pt")
    torch.save(tm.state_dict(), ckpt)
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(40, 56, 3), dtype=np.uint8)
    jpeg = io.BytesIO()
    Image.fromarray(img).save(jpeg, format="JPEG")

    me = MatrixEyes(ckpt)
    server = create_server(me, port=0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, jpeg.getvalue(), me
    server.shutdown()
    server.server_close()
    t.join(timeout=10)


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_healthz(served):
    base, _, me = served
    with urllib.request.urlopen(base + "/healthz") as r:
        rec = json.loads(r.read())
    assert rec["status"] == "ok"
    assert rec["img_size"] == me.cfg.img_size
    assert rec["dtype"] == str(np.dtype(me.runtime.resolved_dtype()))
    assert rec["weight_policy"] == "plain"
    # the measured reason bf16 is the default and mixed is opt-in must
    # stay served (round-5 verdict: "write the measured reason into
    # PERFORMANCE.md and healthz")
    assert "mixed measured" in rec["default_dtype_policy"]
    assert "docs/PERFORMANCE.md" in rec["default_dtype_policy"]


def test_process_depthmap_png(served):
    base, jpeg, _ = served
    code, ctype, body = _post(
        base + "/v1/process?focal-length=35", jpeg)
    assert code == 200 and ctype == "image/png"
    with Image.open(io.BytesIO(body)) as im:
        assert im.size == (56, 40)  # back at source resolution


def test_process_stereogram_resize(served):
    base, jpeg, _ = served
    code, ctype, body = _post(
        base + "/v1/process?format=stereogram&focal-length=35"
               "&resize-scale=2&stereo-amplitude=0.0625", jpeg)
    assert code == 200 and ctype == "image/png"
    with Image.open(io.BytesIO(body)) as im:
        assert im.size == (112, 80)


def test_process_obj_mesh(served):
    base, jpeg, _ = served
    code, ctype, body = _post(
        base + "/v1/process?format=obj&focal-length=35&vertex-mode=plain",
        jpeg)
    assert code == 200 and ctype.startswith("text/plain")
    assert body.startswith(b"o Depth\n") or b"\nv " in body or body.startswith(b"v ")


def test_depth_npy_matches_api(served):
    base, jpeg, me = served
    code, ctype, body = _post(base + "/v1/depth?focal-length=35", jpeg)
    assert code == 200 and ctype == "application/x-npy"
    served_inv = np.load(io.BytesIO(body))
    # same bytes through the library path must agree exactly: the server
    # is a transport, not a different compute path
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
        f.write(jpeg)
        f.flush()
        direct = me.inverse_depth(f.name, focal_length_35mm=35.0)
    np.testing.assert_array_equal(served_inv, direct)


@pytest.mark.parametrize("path,code", [
    ("/v1/process?format=watercolor", 400),   # unknown format
    ("/v1/process?focal-length=nan", 400),    # non-finite number
    ("/v1/process?format=obj&vertex-mode=wireframe", 400),
    # range errors are client errors: they must 400 up front, not surface
    # as 500s from deep inside the pipeline
    ("/v1/process?format=stereogram&resize-scale=0", 400),
    ("/v1/process?format=stereogram&stereo-amplitude=-1", 400),
    ("/v1/process?focal-length=0", 400),
    ("/v1/depth?focal-length=-3", 400),
    ("/v1/nope", 404),
])
def test_bad_requests(served, path, code):
    base, jpeg, _ = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + path, jpeg)
    assert ei.value.code == code
    rec = json.loads(ei.value.read())
    assert "error" in rec


def test_undecodable_body_is_400(served):
    base, _, _ = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/process", b"this is not an image")
    assert ei.value.code == 400


def test_empty_body_is_400(served):
    base, _, _ = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/process", b"")
    assert ei.value.code == 400


def test_bad_vertex_mode_on_image_format_is_400(served):
    # regression: an invalid vertex-mode on a NON-mesh request used to
    # escape as a raw ValueError and drop the connection
    base, jpeg, _ = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/process?format=stereogram&vertex-mode=bogus", jpeg)
    assert ei.value.code == 400


def test_runtime_error_returns_500_json(served):
    # a raw (non-MatrixEyesError) failure inside the model path must come
    # back as a 500 JSON error, not a dropped connection
    base, jpeg, me = served
    orig = me.depth_map
    me.depth_map = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("device fell over"))
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/v1/depth", jpeg)
        assert ei.value.code == 500
        assert "device fell over" in json.loads(ei.value.read())["error"]
    finally:
        me.depth_map = orig


def test_texture_mode_served_as_zip(served, tmp_path):
    """vertex-mode=texture-coordinates (the round-3 format gap): OBJ comes
    back as a zip of out.obj + out.mtl + the texture, with the .mtl's
    map_Kd resolving inside the archive; the .obj bytes equal the library
    path's (the server is a transport, not a different compute path)."""
    import zipfile

    base, jpeg, me = served
    code, ctype, body = _post(
        base + "/v1/process?format=obj&focal-length=35"
               "&vertex-mode=texture-coordinates", jpeg)
    assert code == 200 and ctype == "application/zip"
    zf = zipfile.ZipFile(io.BytesIO(body))
    assert set(zf.namelist()) == {"out.obj", "out.mtl", "texture.jpg"}
    mtl = zf.read("out.mtl").decode()
    assert "map_Kd texture.jpg" in mtl
    obj = zf.read("out.obj").decode()
    assert "mtllib out.mtl" in obj and "usemtl Textured" in obj

    src = tmp_path / "photo.jpg"
    src.write_bytes(jpeg)
    me.process(str(src), str(tmp_path / "out.obj"), focal_length_35mm=35.0,
               vertex_mode="texture-coordinates")
    assert zf.read("out.obj") == (tmp_path / "out.obj").read_bytes()


def test_process_responses_stream_from_disk_spool(served, monkeypatch):
    """Every /v1/process reply (the round-5 memory contract) is spooled on
    disk and streamed via serve._FileResponse -- never materialised in
    server RAM -- and the spool directory is gone after the transfer."""
    import os

    import matrix_eyes_tpu.serve as serve_mod

    base, jpeg, _ = served
    seen = {}
    orig = serve_mod._FileResponse.stream_to

    def spy(self, wfile):
        seen["size"] = self.size
        seen["dir"] = self.cleanup_dir
        return orig(self, wfile)

    monkeypatch.setattr(serve_mod._FileResponse, "stream_to", spy)
    code, ctype, body = _post(
        base + "/v1/process?format=obj&focal-length=35"
               "&vertex-mode=texture-coordinates", jpeg)
    assert code == 200 and ctype == "application/zip"
    assert seen["size"] == len(body)
    # cleanup happens server-side just after the last chunk is written;
    # the client can observe the full body a beat earlier, so poll
    assert seen["dir"] is not None
    import time

    for _ in range(100):
        if not os.path.exists(seen["dir"]):
            break
        time.sleep(0.05)
    assert not os.path.exists(seen["dir"])


def test_spool_cleaned_when_client_aborts_mid_stream(served, monkeypatch):
    """A client that drops the connection before/while the response
    streams must not orphan the spool directory: do_POST's finally calls
    cleanup() even when the send raises (the round-5 review's leak)."""
    import os
    import time

    import matrix_eyes_tpu.serve as serve_mod

    base, jpeg, _ = served
    state = {"dirs": [], "broke": False}
    orig = serve_mod._FileResponse.stream_to

    def broken_once(self, wfile):
        if not state["broke"]:
            state["broke"] = True
            state["dirs"].append(self.cleanup_dir)
            raise BrokenPipeError("client went away")
        return orig(self, wfile)

    monkeypatch.setattr(serve_mod._FileResponse, "stream_to", broken_once)
    with pytest.raises(Exception):
        _post(base + "/v1/process?focal-length=35", jpeg)
    assert state["dirs"] and state["dirs"][0] is not None
    for _ in range(100):
        if not os.path.exists(state["dirs"][0]):
            break
        time.sleep(0.05)
    assert not os.path.exists(state["dirs"][0])
    # the handler thread died with its connection; the server still serves
    code, ctype, _body = _post(base + "/v1/process?focal-length=35", jpeg)
    assert code == 200 and ctype == "image/png"


def test_file_response_transfer_memory_is_chunk_bounded(tmp_path):
    """Streaming a 64 MB spool allocates O(CHUNK), not O(size): the bound
    that keeps a 378 MB texture-mesh reply (times --max-inflight) from
    multi-GB RSS (the round-4 verdict's serve memory hazard)."""
    import tracemalloc

    from matrix_eyes_tpu.serve import _FileResponse

    big = tmp_path / "big.bin"
    with open(big, "wb") as f:
        f.seek(64 * 1024 * 1024 - 1)
        f.write(b"\0")

    class Sink:
        def write(self, b):
            return len(b)

    resp = _FileResponse(str(big))
    assert resp.size == 64 * 1024 * 1024
    tracemalloc.start()
    resp.stream_to(Sink())
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 8 * 1024 * 1024, peak


def test_texture_mode_transcodes_exotic_encodings(served):
    """A GIF body decodes fine as a SOURCE but is useless as an OBJ map_Kd
    target; the served zip must carry a transcoded texture.png, never an
    unresolvable extension."""
    import zipfile

    base, jpeg, _ = served
    gif = io.BytesIO()
    with Image.open(io.BytesIO(jpeg)) as im:
        im.save(gif, format="GIF")
    code, ctype, body = _post(
        base + "/v1/process?format=obj&focal-length=35"
               "&vertex-mode=texture-coordinates", gif.getvalue())
    assert code == 200 and ctype == "application/zip"
    zf = zipfile.ZipFile(io.BytesIO(body))
    assert set(zf.namelist()) == {"out.obj", "out.mtl", "texture.png"}
    assert "map_Kd texture.png" in zf.read("out.mtl").decode()
    with Image.open(io.BytesIO(zf.read("texture.png"))) as tex:
        assert tex.format == "PNG"


def test_ply_texture_mode_stays_single_response(served):
    # PLY has no sidecar in any vertex mode: texture-coordinates must not
    # be rejected, and the response stays one binary PLY
    base, jpeg, _ = served
    code, ctype, body = _post(
        base + "/v1/process?format=ply&focal-length=35"
               "&vertex-mode=texture-coordinates", jpeg)
    assert code == 200 and ctype == "application/octet-stream"
    assert body.startswith(b"ply\n")


def test_overload_returns_503(served):
    """More concurrent POSTs than --max-inflight: the excess request gets
    an immediate 503 + Retry-After while the in-flight one completes."""
    import concurrent.futures

    base, jpeg, me = served
    release = threading.Event()
    started = threading.Event()
    orig = me.depth_map

    def slow(*a, **k):
        started.set()
        release.wait(10)
        return orig(*a, **k)

    me.depth_map = slow
    server = create_server(me, port=0, max_inflight=1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    b2 = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with concurrent.futures.ThreadPoolExecutor(1) as ex:
            fut = ex.submit(_post, b2 + "/v1/depth?focal-length=35", jpeg)
            assert started.wait(10), "first request never reached the model"
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(b2 + "/v1/depth?focal-length=35", jpeg)
            assert ei.value.code == 503
            assert ei.value.headers.get("Retry-After")
            # the server drops the connection after a 503: it must SAY so,
            # or an HTTP/1.1 client may pipeline into a dead socket
            assert ei.value.headers.get("Connection") == "close"
            release.set()
            code, _, _ = fut.result(timeout=30)
            assert code == 200
    finally:
        release.set()
        me.depth_map = orig
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def test_concurrent_requests_both_succeed(served):
    # the lock covers only the device section; decode/encode from two
    # request threads must interleave without corrupting either response
    import concurrent.futures

    base, jpeg, me = served

    def one(seed):
        code, ctype, body = _post(
            base + "/v1/process?format=stereogram&focal-length=35", jpeg)
        return code, ctype, body

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        results = list(ex.map(one, range(4)))
    assert all(c == 200 and t == "image/png" for c, t, _ in results)
    # the session seed is fixed, so identical inputs => identical bytes:
    # any cross-request state corruption would show up as a divergence
    assert len({b for _, _, b in results}) == 1


# --- micro-batching (--max-batch) -------------------------------------------

class _StubDM:
    """DepthMap stand-in: .data.block_until_ready() and an identity tag."""

    def __init__(self, tag):
        self.tag = tag
        self.data = self

    def block_until_ready(self):
        return self


class _StubSession:
    """Records batch compositions; optionally blocks inside the first call
    so a test can force followers to queue up behind the leader."""

    def __init__(self, first_call_gate=None):
        self.calls = []
        self.first_call_gate = first_call_gate

    def depth_maps(self, sources, pad_to_pow2=False):
        self.calls.append(list(sources))
        if self.first_call_gate is not None and len(self.calls) == 1:
            self.first_call_gate.wait(timeout=10)
        return [_StubDM(s) for s in sources]


def test_microbatcher_coalesces_queued_requests():
    """While the leader holds the device lock, followers enqueue; the next
    leader drains them into ONE batched call. Each job gets ITS OWN result
    (source identity), including the leader's."""
    from matrix_eyes_tpu.serve import _MicroBatcher

    gate = threading.Event()
    session = _StubSession(first_call_gate=gate)
    mb = _MicroBatcher(session, threading.Lock(), max_batch=4)

    results = {}
    def request(src):
        results[src] = mb.depth_map(src)

    t0 = threading.Thread(target=request, args=("s0",))
    t0.start()
    while not session.calls:  # leader is inside depth_maps, holding the lock
        if not t0.is_alive():
            break
        threading.Event().wait(0.01)
    followers = [threading.Thread(target=request, args=(f"s{i}",))
                 for i in range(1, 4)]
    for t in followers:
        t.start()
    # wait until all three are queued behind the lock, then release the leader
    deadline = 50
    while len(mb._q) < 3 and deadline:
        threading.Event().wait(0.02)
        deadline -= 1
    gate.set()
    t0.join(timeout=10)
    for t in followers:
        t.join(timeout=10)
    assert sorted(results) == ["s0", "s1", "s2", "s3"]
    for src, dm in results.items():
        assert dm.tag == src, f"{src} got {dm.tag}'s result"
    # first call was the lone leader; the queued three coalesced afterwards
    assert [len(c) for c in session.calls] == [1, 3]


def test_microbatcher_leader_batch_always_contains_own_job():
    """More pending jobs than max_batch: every job still completes (a leader
    that drained only the queue head could strand itself)."""
    from matrix_eyes_tpu.serve import _MicroBatcher

    gate = threading.Event()
    session = _StubSession(first_call_gate=gate)
    mb = _MicroBatcher(session, threading.Lock(), max_batch=2)

    results = {}
    def request(src):
        results[src] = mb.depth_map(src)

    threads = [threading.Thread(target=request, args=(f"q{i}",))
               for i in range(6)]
    threads[0].start()
    while not session.calls and threads[0].is_alive():
        threading.Event().wait(0.01)
    for t in threads[1:]:
        t.start()
    deadline = 50
    while len(mb._q) < 5 and deadline:
        threading.Event().wait(0.02)
        deadline -= 1
    gate.set()
    for t in threads:
        t.join(timeout=10)
    assert len(results) == 6
    for src, dm in results.items():
        assert dm.tag == src
    assert all(len(c) <= 2 for c in session.calls)


def test_microbatcher_error_propagates_to_all_taken_jobs():
    from matrix_eyes_tpu.serve import _MicroBatcher

    class _Boom:
        def depth_maps(self, sources, pad_to_pow2=False):
            raise RuntimeError("device fell over")

    mb = _MicroBatcher(_Boom(), threading.Lock(), max_batch=4)
    with pytest.raises(RuntimeError, match="device fell over"):
        mb.depth_map("x")
    assert mb._q == []  # no stranded jobs


@pytest.fixture(scope="module")
def served_batched(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_mb")
    tm = torch_ref.randomize(torch_ref.DepthPro(TINY), seed=21)
    ckpt = str(d / "tiny.pt")
    torch.save(tm.state_dict(), ckpt)
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(40, 56, 3), dtype=np.uint8)
    jpeg = io.BytesIO()
    Image.fromarray(img).save(jpeg, format="JPEG")

    me = MatrixEyes(ckpt)
    server = create_server(me, port=0, max_batch=4)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, jpeg.getvalue(), me
    server.shutdown()
    server.server_close()
    t.join(timeout=10)


def test_batched_serve_concurrent_depth_requests_correct(served_batched):
    """8 concurrent /v1/depth requests against a --max-batch=4 server: all
    succeed and every response equals the session's own answer for its
    image (micro-batching must never cross-wire results)."""
    base, jpeg, me = served_batched
    # distinct bodies -> distinct answers, so cross-wiring would be caught
    rng = np.random.RandomState(3)
    bodies, want = [], []
    for i in range(4):
        arr = rng.randint(0, 256, size=(40, 56, 3), dtype=np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, format="PNG")  # lossless: exact pixels
        bodies.append(b.getvalue())
        want.append(me.inverse_depth(arr, focal_length_35mm=35.0))

    results = [None] * 8
    def go(i):
        code, _ct, body = _post(base + "/v1/depth?focal-length=35",
                                bodies[i % 4])
        results[i] = (code, np.load(io.BytesIO(body)))

    threads = [threading.Thread(target=go, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for i, r in enumerate(results):
        assert r is not None, f"request {i} never completed"
        code, got = r
        assert code == 200
        np.testing.assert_allclose(got, want[i % 4], rtol=2e-4, atol=2e-5)


def test_batched_serve_process_png_matches_unbatched(served_batched, served):
    """The same photo through the batched server and the plain server must
    produce equivalent PNGs (batch-1 arrival on an idle server: identical
    program up to batch padding)."""
    base_mb, jpeg, _ = served_batched
    base, jpeg2, _me = served
    assert jpeg == jpeg2  # same fixture bytes
    _c1, _t1, png_mb = _post(base_mb + "/v1/process?focal-length=35", jpeg)
    _c2, _t2, png = _post(base + "/v1/process?focal-length=35", jpeg)
    a = np.asarray(Image.open(io.BytesIO(png_mb))).astype(np.int16)
    b = np.asarray(Image.open(io.BytesIO(png))).astype(np.int16)
    assert a.shape == b.shape
    assert np.abs(a - b).max() <= 1
