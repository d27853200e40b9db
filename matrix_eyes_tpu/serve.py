"""HTTP serving front end: the MatrixEyes session behind a tiny server.

The reference is a one-photo-per-process CLI (main.rs:149-173); production
serving wants the opposite -- load the 1.9 GB checkpoint and compile once,
then answer many requests. ``api.MatrixEyes`` already amortises both; this
module exposes it over HTTP with nothing but the standard library:

    python -m matrix_eyes_tpu.serve --checkpoint-path=./checkpoints/depth_pro.pt --port=8000

    curl -X POST --data-binary @photo.jpg \
        'localhost:8000/v1/process?format=stereogram' > out.png
    curl -X POST --data-binary @photo.jpg 'localhost:8000/v1/depth' > inv.npy
    curl localhost:8000/healthz

Routes
------
* ``GET /healthz`` -- liveness + the session's config (the model is loaded
  before the socket opens, so 200 here means ready).
* ``POST /v1/process?format=depthmap|stereogram|obj|ply`` -- body is the
  encoded photo (JPEG/PNG/anything PIL reads; EXIF focal length and
  orientation are honoured exactly like the CLI). Returns the rendered
  PNG (``image/png``) or mesh bytes (OBJ ``text/plain``, PLY binary
  ``application/octet-stream``). Optional query params mirror the CLI
  flags: ``focal-length``, ``resize-scale``, ``stereo-amplitude``,
  ``vertex-mode`` (meshes: plain|vertex-colors|texture-coordinates --
  the last returns ``application/zip`` for OBJ, bundling the .obj, its
  .mtl sidecar and the texture image the .mtl references, all relative
  paths, matching the CLI's on-disk layout; output.rs:525-547).
* ``POST /v1/depth`` -- clamped inverse depth at model grid resolution as
  an ``.npy`` payload (``application/x-npy``), the serving-friendly form
  of ``MatrixEyes.inverse_depth``.

Device dispatch is serialised with a lock: one chip runs one forward at a
time anyway, and the AOT/sharding caches on the session are not written
for concurrent mutation. Request decode/encode (the host-side work)
happens outside the lock, so overlapping requests pipeline naturally.
``--max-batch=N`` (default 1 = off) additionally coalesces concurrent
request forwards into ONE batched XLA program (leader-follower over the
device lock, see _MicroBatcher): burst load runs at the batched
throughput of BASELINE config 5 instead of N serialized forwards, while
an idle-arrival request still runs batch-1 latency.
In-flight POST work is bounded by a semaphore (``--max-inflight``,
default 8): excess requests get an immediate 503 + Retry-After instead of
pinning an unbounded number of handler threads each holding a decoded
body. ``/v1/process`` responses are spooled on disk and STREAMED to the
socket in fixed-size chunks (_FileResponse): a 12 MP texture-coordinates
mesh is a ~378 MB OBJ, and per-request memory stays O(1 MiB) rather than
O(response) x max-inflight. Errors map to JSON: 400 for bad inputs
(undecodable image, unknown format, out-of-range numbers), 500 for
reconstruction failures -- the same stage messages the CLI prints
(errors.py). Burst throughput is measured through real HTTP by
scripts/bench_serve_burst.py (the BASELINE config-5 number over this
surface; committed artifact docs/perf/serve_burst_r5.json).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

from matrix_eyes_tpu.errors import MatrixEyesError, ReconstructionError
from matrix_eyes_tpu.io.image import load_source_image

# format -> (destination extension, response content type)
_FORMATS = {
    "depthmap": (".png", "image/png"),
    "stereogram": (".png", "image/png"),
    "obj": (".obj", "text/plain; charset=utf-8"),
    "ply": (".ply", "application/octet-stream"),
}
_MAX_BODY = 128 * 1024 * 1024  # a 12 MP photo is ~36 MB raw; JPEG far less


class BadRequest(ValueError):
    """Client-side error -> HTTP 400."""


class _OversizedBody(BadRequest):
    """The body was never read; the connection must be torn down after the
    reply (a keep-alive peer still streaming its upload could otherwise
    deadlock against the unread socket buffer)."""


def _one_float(q: dict, name: str, positive: bool = False) -> Optional[float]:
    vals = q.get(name)
    if not vals:
        return None
    try:
        v = float(vals[-1])
    except ValueError:
        raise BadRequest(f"{name} must be a number, got {vals[-1]!r}")
    if not (v == v) or v in (float("inf"), float("-inf")):
        raise BadRequest(f"{name} must be finite")
    if positive and v <= 0:
        # range errors are the CLIENT's fault: without this they surface
        # deep in the pipeline as a 500 (zero-size stereogram geometry,
        # negative focal) when they should be a 400
        raise BadRequest(f"{name} must be > 0, got {v}")
    return v


def _sniff_image_ext(path: str) -> Optional[str]:
    """Extension for the decoded body's actual encoding (PIL reads the
    header only); OBJ viewers resolve map_Kd textures by extension.
    Returns None for encodings outside the set viewers commonly load
    (GIF/PPM/... decode fine as a SOURCE but make a useless map_Kd
    target) -- the caller transcodes those to PNG."""
    from PIL import Image

    try:
        with Image.open(path) as im:
            fmt = (im.format or "").lower()
    except Exception:
        fmt = ""
    return {"jpeg": ".jpg", "png": ".png", "bmp": ".bmp",
            "tiff": ".tif", "webp": ".webp"}.get(fmt)


def _zip_files(directory: str, names, out_path: str) -> None:
    """Zip ``names`` (paths relative to ``directory``) into ``out_path``.
    Deflate level 1: a 12 MP mesh's OBJ is hundreds of MB of ASCII; level 1
    compresses it several-fold at ~100 MB/s, higher levels only add
    latency. Spooled to disk, never RAM: the response is streamed from the
    file (_FileResponse)."""
    import zipfile

    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED,
                         compresslevel=1) as zf:
        for name in names:
            zf.write(os.path.join(directory, name), arcname=name)


class _FileResponse:
    """A response spooled on disk and streamed to the socket in fixed-size
    chunks, so per-request memory stays O(CHUNK) no matter how large the
    output (a 12 MP texture-coordinates mesh is a ~378 MB OBJ; holding it
    -- times --max-inflight -- in RAM was the round-4 memory hazard).

    Owns its temp directory: ``cleanup()`` runs after the stream (or on a
    failed send), so the file lives exactly as long as the transfer."""

    CHUNK = 1 << 20

    def __init__(self, path: str, cleanup_dir: Optional[str] = None):
        self.path = path
        self.cleanup_dir = cleanup_dir
        self.size = os.path.getsize(path)

    def stream_to(self, wfile) -> None:
        import shutil

        try:
            with open(self.path, "rb") as f:
                shutil.copyfileobj(f, wfile, self.CHUNK)
        finally:
            self.cleanup()

    def cleanup(self) -> None:
        import shutil

        if self.cleanup_dir is not None:
            shutil.rmtree(self.cleanup_dir, ignore_errors=True)
            self.cleanup_dir = None


class _MicroBatcher:
    """Coalesce concurrent request forwards into ONE batched XLA program.

    Leader-follower over the device lock: every request enqueues its
    decoded source, then contends for the lock. Whoever holds it drains up
    to ``max_batch`` pending jobs (its own included) and runs one batched
    forward (``api.MatrixEyes.depth_maps``, padded to the next power of
    two so at most log2(max_batch)+1 distinct batch shapes ever compile);
    followers whose job was taken just wait for their result. Under burst
    load this turns N serialized single-image forwards into ceil(N/B)
    batched ones -- the BASELINE config-5 throughput shape, behind HTTP.

    A request that arrives while the device is idle still runs batch-1
    (padded to 1): latency is never traded away when there is no queue.
    """

    def __init__(self, session, lock: threading.Lock, max_batch: int):
        self.session = session
        self.lock = lock
        self.max_batch = max_batch
        self._q: list = []
        self._q_lock = threading.Lock()

    def depth_map(self, source):
        job = {"src": source, "ev": threading.Event(),
               "dm": None, "err": None}
        with self._q_lock:
            self._q.append(job)
        if not job["ev"].is_set():
            with self.lock:
                # A previous leader may have taken our job while we waited
                # for the lock (it will set our event); otherwise WE lead,
                # and the batch MUST contain our own job -- draining only
                # the queue head could serve four peers and strand us
                # waiting on an event no one remains to set.
                with self._q_lock:
                    # identity scan, NOT ``in``: jobs hold SourceImages
                    # whose dataclass == compares numpy pixel arrays
                    mine = next((i for i, j in enumerate(self._q)
                                 if j is job), None)
                    if mine is not None:
                        self._q.pop(mine)
                        peers = self._q[:self.max_batch - 1]
                        del self._q[:len(peers)]
                        take = [job] + peers
                    else:
                        take = []
                if take:
                    try:
                        dms = self.session.depth_maps(
                            [j["src"] for j in take], pad_to_pow2=True)
                        for dm in dms:
                            dm.data.block_until_ready()
                        for j, dm in zip(take, dms):
                            j["dm"] = dm
                    except Exception as err:
                        for j in take:
                            j["err"] = err
                    finally:
                        for j in take:
                            j["ev"].set()
        job["ev"].wait()
        if job["err"] is not None:
            # every job in a failed batch shares ONE exception instance;
            # `raise err` reassigns err.__traceback__, so concurrent handler
            # threads raising it directly would garble each other's printed
            # tracebacks. Re-raise a per-thread clone chained to the original
            # (same type, so the 400/500 status mapping is preserved).
            err = job["err"]
            try:
                clone = type(err)(*err.args)
            except Exception:
                clone = RuntimeError(f"{type(err).__name__}: {err}")
            raise clone from err
        return job["dm"]


class _Handler(BaseHTTPRequestHandler):
    # set by create_server
    session = None
    lock: threading.Lock = None
    inflight: threading.BoundedSemaphore = None
    batcher: Optional[_MicroBatcher] = None  # --max-batch > 1
    protocol_version = "HTTP/1.1"

    def _forward(self, source, dst=None, image_format=None,
                 resize_scale=None, amplitude=None, seed=None):
        """The device section of a request: the model forward (plus the
        stereogram noise prefetch when rendering one). With micro-batching
        enabled, concurrent requests coalesce into one batched program; the
        noise prefetch happens before enqueueing so its transfer rides the
        link while the (possibly batched) forward computes."""
        import dataclasses

        import jax.numpy as jnp

        from matrix_eyes_tpu.output.depthmap import maybe_prefetch_stereo_noise

        # Start this request's host->device pixel transfer NOW, before the
        # device lock / batch queue: JAX transfers are async and dispatch
        # is thread-safe, so the ~36 MB upload of a 12 MP photo rides the
        # link while earlier requests' forwards compute instead of
        # serialising inside the device section (the steady-state request
        # breakdown in docs/perf/serve_burst_r5.json motivated this).
        # Downstream jnp.asarray(src.rgb) is a no-op on a device array.
        source = dataclasses.replace(source, rgb=jnp.asarray(source.rgb))
        noise = None
        if self.batcher is not None:
            if dst is not None:
                noise = maybe_prefetch_stereo_noise(
                    dst, image_format, source.original_size, resize_scale,
                    amplitude, seed)
            return self.batcher.depth_map(source), noise
        with self.lock:
            # device section only: noise prefetch + the model forward
            # (the same ordering as api.process -- the noise transfer
            # rides the link while the forward computes)
            if dst is not None:
                noise = maybe_prefetch_stereo_noise(
                    dst, image_format, source.original_size, resize_scale,
                    amplitude, seed)
            dm = self.session.depth_map(source)
            dm.data.block_until_ready()
        return dm, noise

    # -- plumbing ----------------------------------------------------------

    def log_message(self, fmt, *args):  # route through one line per request
        print(f"serve: {self.address_string()} {fmt % args}", flush=True)

    def _reply(self, code: int, body, ctype: str) -> None:
        """``body``: bytes (small replies) or a _FileResponse, streamed in
        fixed chunks with its temp dir cleaned up after the transfer."""
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        size = body.size if isinstance(body, _FileResponse) else len(body)
        self.send_header("Content-Length", str(size))
        if self.close_connection:
            # we are about to drop the connection (oversized body, raw
            # failure): say so, or an HTTP/1.1 client may legally pipeline
            # its next request into a socket we already closed
            self.send_header("Connection", "close")
        self.end_headers()
        if isinstance(body, _FileResponse):
            body.stream_to(self.wfile)
        else:
            self.wfile.write(body)

    def _reply_json(self, code: int, obj) -> None:
        self._reply(code, json.dumps(obj).encode() + b"\n", "application/json")

    def _read_body(self) -> bytes:
        try:
            length = int(self.headers.get("Content-Length") or 0)
        except ValueError:
            raise BadRequest("Content-Length must be an integer")
        if length <= 0:
            raise BadRequest("request body must contain the encoded photo")
        if length > _MAX_BODY:
            # the body stays unread: a keep-alive peer would have its next
            # request parsed out of these bytes, so drop the connection
            self.close_connection = True
            raise _OversizedBody(f"body too large ({length} bytes)")
        return self.rfile.read(length)

    # -- routes ------------------------------------------------------------

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/healthz":
            import numpy as np

            rt = self.session.runtime
            self._reply_json(200, {
                "status": "ok",
                "model": "depth_pro",
                "img_size": self.session.cfg.img_size,
                "dtype": str(np.dtype(rt.resolved_dtype())),
                # weight-precision policy on top of the compute dtype
                # (ops/quant.py int8, ops/mixed.py mixed)
                "weight_policy": ("int8" if rt.quantize_int8
                                  else "mixed" if rt.mixed_bf16 else "plain"),
                # the measured reason bf16 is the TPU default and mixed is
                # opt-in (round-5 decision, BENCH_r05 / docs/PERFORMANCE.md
                # "Default dtype"): mixed's f32 stages run at the MXU's
                # 1/8-rate HIGHEST decomposition -- 0.447 s device (2.7x
                # bf16's 0.164 s) and 1.0-1.8 s depth-map e2e across
                # tunnel windows, at/over the < 1 s/image target bf16
                # clears with margin; its accuracy win (canonical p99
                # 0.23 % vs 6.1 %) is one --dtype=mixed flag away
                "default_dtype_policy": (
                    "bf16: mixed measured 2.7x device time (0.447 s vs "
                    "0.164 s; depth-map e2e 1.0-1.8 s vs the < 1 s "
                    "target) -- see docs/PERFORMANCE.md 'Default dtype "
                    "decision'"),
            })
            return
        if path == "/":
            self._reply(200, __doc__.encode(), "text/plain; charset=utf-8")
            return
        self._reply_json(404, {"error": f"no such route: {path}"})

    def do_POST(self):
        url = urlparse(self.path)
        q = parse_qs(url.query)
        # Bound in-flight work BEFORE reading the body: ThreadingHTTPServer
        # spawns a thread per connection with no queue limit, so without
        # this N slow clients pin N threads each holding a ~36 MB body.
        # Excess load gets an immediate 503 (and the connection dropped --
        # the unread body would desync a keep-alive stream).
        if not self.inflight.acquire(blocking=False):
            self.close_connection = True
            self.send_response(503)
            self.send_header("Retry-After", "1")
            body = b'{"error": "server at capacity"}\n'
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Connection", "close")
            self.end_headers()
            self.wfile.write(body)
            return
        try:
            try:
                body = self._read_body()
                if url.path == "/v1/process":
                    out, ctype = self._process(body, q)
                elif url.path == "/v1/depth":
                    out, ctype = self._depth(body, q)
                else:
                    self._reply_json(404, {"error": f"no such route: {url.path}"})
                    return
            except _OversizedBody as e:
                # reply, then shut the socket down hard: a client still
                # streaming its oversized upload may never read our
                # response while blocked on send() against the server's
                # full (unread) receive buffer
                self._reply_json(400, {"error": str(e)})
                import socket as _socket

                try:
                    self.connection.shutdown(_socket.SHUT_RDWR)
                except OSError:
                    pass
                return
            except BadRequest as e:
                self._reply_json(400, {"error": str(e)})
                return
            except ReconstructionError as e:
                # undecodable body etc. -- the client's fault
                self._reply_json(400, {"error": str(e)})
                return
            except MatrixEyesError as e:
                self._reply_json(500, {"error": str(e)})
                return
            except Exception as e:  # runtime/device errors: reply, don't drop
                import traceback

                traceback.print_exc()
                self.close_connection = True  # state after a raw failure is
                self._reply_json(500, {"error": f"{type(e).__name__}: {e}"})
                return                        # not worth trusting for reuse
            try:
                self._reply(200, out, ctype)
            finally:
                # a client that aborts before (or during) the stream would
                # otherwise orphan the spool directory: send_response /
                # send_header can raise BrokenPipeError before stream_to's
                # own cleanup is reached. cleanup() is idempotent.
                if isinstance(out, _FileResponse):
                    out.cleanup()
        finally:
            self.inflight.release()

    # -- work --------------------------------------------------------------

    def _process(self, body: bytes, q: dict):
        from matrix_eyes_tpu.output.depthmap import (
            ImageOutputFormat,
            VertexMode,
        )

        fmt = (q.get("format") or ["depthmap"])[-1]
        if fmt not in _FORMATS:
            raise BadRequest(
                f"format must be one of {sorted(_FORMATS)}, got {fmt!r}")
        ext, ctype = _FORMATS[fmt]
        # validated for EVERY request: an invalid value must 400, never
        # reach VertexMode() and crash the handler
        vertex_mode = (q.get("vertex-mode") or ["vertex-colors"])[-1]
        if vertex_mode not in ("plain", "vertex-colors",
                               "texture-coordinates"):
            raise BadRequest(
                f"vertex-mode must be plain|vertex-colors|"
                f"texture-coordinates, got {vertex_mode!r}")
        # OBJ texture mode writes a .mtl sidecar referencing the texture
        # image (output.rs:525-547): served as a zip of all three files,
        # with relative paths, exactly the CLI's on-disk layout. (PLY has
        # no sidecar in any mode; it stays a single binary response.)
        texture_zip = fmt == "obj" and vertex_mode == "texture-coordinates"
        if texture_zip:
            ctype = "application/zip"
        focal = _one_float(q, "focal-length", positive=True)
        resize_scale = _one_float(q, "resize-scale", positive=True)
        amplitude = _one_float(q, "stereo-amplitude", positive=True)
        if amplitude is None:
            amplitude = 1.0 / 16.0
        image_format = ImageOutputFormat(
            "stereogram" if fmt == "stereogram" else "depthmap")
        seed = self.session.runtime.seed

        # Manual mkdtemp, not TemporaryDirectory: the output file must
        # outlive this function -- the response is STREAMED from it in
        # fixed-size chunks (_FileResponse owns the directory and removes
        # it after the transfer), so a 378 MB texture-mesh reply never
        # materialises in RAM. On any error before the handoff the
        # directory is removed here.
        import shutil

        d = tempfile.mkdtemp(prefix="me_serve_")
        try:
            src = os.path.join(d, "src.bin")  # PIL sniffs content, not name
            with open(src, "wb") as f:
                f.write(body)
            dst = os.path.join(d, "out" + ext)
            # decode outside the lock (host work; overlaps other requests)
            source = load_source_image(src, focal)
            dm, noise = self._forward(source, dst, image_format,
                                      resize_scale, amplitude, seed)
            # readback + encode outside the lock (the shift/render
            # programs it dispatches are ~ms of device time; JAX dispatch
            # is thread-safe, so this overlaps the next request's forward)
            if texture_zip:
                # the .mtl's map_Kd must be a RELATIVE name that exists
                # inside the zip; the texture is the request body itself,
                # named by its sniffed encoding -- except encodings OBJ
                # viewers can't load (GIF/PPM/...), which get transcoded
                # to PNG so the delivered archive is always self-contained
                tex_ext = _sniff_image_ext(src)
                if tex_ext is None:
                    from PIL import Image

                    tex_name = "texture.png"
                    with Image.open(src) as im:
                        im.convert("RGB").save(
                            os.path.join(d, tex_name), "PNG")
                else:
                    tex_name = "texture" + tex_ext
                    os.replace(src, os.path.join(d, tex_name))
                dm.output_image(dst, tex_name, image_format=image_format,
                                vertex_mode=VertexMode(vertex_mode),
                                resize_scale=resize_scale,
                                amplitude=amplitude, seed=seed,
                                stereo_noise=noise)
                zip_path = os.path.join(d, "bundle.zip")
                _zip_files(d, ["out.obj", "out.mtl", tex_name], zip_path)
                resp = _FileResponse(zip_path, cleanup_dir=d)
                d = None  # ownership moved to the response
                return resp, ctype
            dm.output_image(dst, src, image_format=image_format,
                            vertex_mode=VertexMode(vertex_mode),
                            resize_scale=resize_scale, amplitude=amplitude,
                            seed=seed, stereo_noise=noise)
            resp = _FileResponse(dst, cleanup_dir=d)
            d = None  # ownership moved to the response
            return resp, ctype
        finally:
            if d is not None:
                shutil.rmtree(d, ignore_errors=True)

    def _depth(self, body: bytes, q: dict):
        import io

        import numpy as np

        focal = _one_float(q, "focal-length", positive=True)
        with tempfile.TemporaryDirectory(prefix="me_serve_") as d:
            src = os.path.join(d, "src.bin")
            with open(src, "wb") as f:
                f.write(body)
            source = load_source_image(src, focal)  # decode: no lock
            dm, _noise = self._forward(source)
        inv = dm.to_numpy()  # readback: no lock
        buf = io.BytesIO()
        np.save(buf, inv)
        return buf.getvalue(), "application/x-npy"


def create_server(session, host: str = "127.0.0.1",
                  port: int = 8000,
                  max_inflight: int = 8,
                  max_batch: int = 1) -> ThreadingHTTPServer:
    """A ready-to-run server bound to ``session`` (an api.MatrixEyes).

    Separated from main() so tests (and embedders) can run it on an
    ephemeral port in a thread: ``create_server(me, port=0)`` then
    ``server.serve_forever()`` / ``server.shutdown()``.

    ``max_inflight`` bounds concurrent POST work (body held + pipeline
    running); requests beyond it get 503 + Retry-After immediately.
    ``max_batch`` > 1 coalesces concurrent request forwards into one
    batched program (see _MicroBatcher); 1 keeps strict one-forward-at-a-
    time dispatch, whose numerics exactly match the CLI's.
    """
    lock = threading.Lock()
    handler = type("BoundHandler", (_Handler,), {
        "session": session,
        "lock": lock,
        "inflight": threading.BoundedSemaphore(max_inflight),
        "batcher": _MicroBatcher(session, lock, max_batch)
        if max_batch > 1 else None,
    })
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None) -> int:
    import argparse

    from matrix_eyes_tpu.api import MatrixEyes

    ap = argparse.ArgumentParser(
        prog="matrix-eyes-serve",
        description="Serve Depth Pro over HTTP (load once, answer many).")
    ap.add_argument("--checkpoint-path", default="./checkpoints/depth_pro.pt")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--dtype", default=None,
                    help="f32|bf16|f16|int8 (default: bf16 on TPU)")
    ap.add_argument("--seed", type=int, default=0,
                    help="stereogram noise seed")
    ap.add_argument("--no-flash-attention", action="store_true")
    ap.add_argument("--convert-checkpoints", action="store_true")
    ap.add_argument("--max-inflight", type=int, default=8,
                    help="concurrent in-flight POST bound (excess -> 503)")
    ap.add_argument("--max-batch", type=int, default=1,
                    help="coalesce up to N concurrent forwards into one "
                         "batched program (1 = off)")
    args = ap.parse_args(argv)

    session = MatrixEyes(
        args.checkpoint_path,
        dtype=args.dtype,
        seed=args.seed,
        flash_attention=False if args.no_flash_attention else None,
        convert_checkpoints=args.convert_checkpoints,
    )
    server = create_server(session, args.host, args.port,
                           max_inflight=args.max_inflight,
                           max_batch=args.max_batch)
    host, port = server.server_address[:2]
    print(f"serving depth_pro on http://{host}:{port} "
          f"(/healthz, /v1/process, /v1/depth)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
