"""HTTP detection server with transparent micro-batching.

Beyond-reference serving layer (the reference stops at CLI scripts;
SURVEY.md §2.1 #9-10).  Production-shaped on purpose:

* **Micro-batching**: concurrent requests are letterboxed on their own
  threads (cv2 releases the GIL), queued, and coalesced by a single device
  thread into one ``detect_prepared`` call — up to ``batch_max`` images or
  ``batch_timeout_ms``, whichever first.  The TPU sees large batches even
  when clients send single images, and the shape-agnostic prepared pipeline
  means ONE compiled executable serves every client resolution.
* **Bounded pipeline keys**: batches are padded to the next power of two
  (<= batch_max), so at most log2(batch_max)+1 executables ever compile.
* **uint8 transfer** end-to-end: request bytes -> decoded uint8 -> rounded
  uint8 letterbox canvas -> device (/255 fused on-device).

Endpoints:
  POST /detect        image bytes (jpeg/png/...) -> JSON detections
  GET  /healthz       liveness + model summary
  GET  /stats         rolling latency/throughput (utils/profiling)

stdlib-only (http.server + threading) by design: no framework deps.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from dataclasses import dataclass, field

import numpy as np

from .ops.preprocess import letterbox_host
from .parallel.sharding import pad_to_multiple

# Reject request bodies above this size before reading them (a single huge
# Content-Length must not be able to exhaust server memory).
MAX_BODY_BYTES = 32 * 1024 * 1024


def _pow2_bucket(n: int, cap: int) -> int:
    b = 1
    while b < n and b < cap:
        b *= 2
    return min(b, cap)


def _mesh_bucket(n: int, cap: int, floor: int) -> int:
    """The batch a flush of ``n`` requests actually runs: the pow2 bucket
    rounded UP to a multiple of ``floor`` (GSPMD: batches must divide a
    mesh-bound detector's mesh), capped at ``cap`` (itself a floor
    multiple)."""
    return min(pad_to_multiple(_pow2_bucket(n, cap), floor), cap)


def bucket_ladder(cap: int, floor: int = 1) -> list[int]:
    """Every batch size the MicroBatcher can dispatch — the exact set the
    server warmup must precompile so no first request waits on a compile."""
    return sorted({_mesh_bucket(n, cap, floor) for n in range(1, cap + 1)})


@dataclass
class _Pending:
    lb: np.ndarray          # letterboxed canvas (uint8)
    geo: list[float]        # [scale, pad_x, pad_y, orig_w, orig_h]
    event: threading.Event = field(default_factory=threading.Event)
    result: "dict | None" = None
    error: "str | None" = None


class MicroBatcher:
    """Coalesces concurrent detection requests into device batches."""

    def __init__(self, detector, size: int, conf: float, iou: float,
                 max_det: int = 300, batch_max: int = 8,
                 batch_timeout_ms: float = 5.0):
        self.det = detector
        self.size = size
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        # GSPMD: prepared-pipeline batches must divide a mesh-bound
        # detector's mesh, so the bucket floor is the mesh size (sub-mesh
        # batches would fail sharding) and batch_max rounds up to it.
        mesh = getattr(detector, "mesh", None)
        self.bucket_floor = mesh.devices.size if mesh is not None else 1
        rounded = pad_to_multiple(batch_max, self.bucket_floor)
        if rounded != batch_max:
            logging.getLogger("pytorch_yolo_tpu.serve").info(
                "batch_max %d rounded up to %d (multiple of the %d-device "
                "mesh)", batch_max, rounded, self.bucket_floor)
        self.batch_max = rounded
        self.timeout_s = batch_timeout_ms / 1e3
        self._queue: list[_Pending] = []
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="pyt-batcher")
        self._thread.start()

    def submit(self, img: np.ndarray) -> _Pending:
        lb, g = letterbox_host(img, self.size, out_dtype="uint8")
        p = _Pending(lb=lb, geo=[g.scale, g.pad_x, g.pad_y, g.orig_w, g.orig_h])
        with self._lock:
            self._queue.append(p)
        self._wake.set()
        return p

    def close(self) -> None:
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)

    # -- device thread --------------------------------------------------
    def _run(self) -> None:
        while not self._stop:
            self._wake.wait()
            if self._stop:
                return
            # brief coalescing window: let concurrent requests pile up
            deadline = time.perf_counter() + self.timeout_s
            while time.perf_counter() < deadline:
                with self._lock:
                    if len(self._queue) >= self.batch_max:
                        break
                time.sleep(0.0005)
            with self._lock:
                batch, self._queue = (self._queue[: self.batch_max],
                                      self._queue[self.batch_max:])
                if not self._queue:
                    self._wake.clear()
            if not batch:
                continue
            try:
                self._flush(batch)
            except Exception as e:  # surface device errors to every waiter
                for p in batch:
                    p.error = f"{type(e).__name__}: {e}"
                    p.event.set()

    def _flush(self, batch: "list[_Pending]") -> None:
        n = len(batch)
        run_n = _mesh_bucket(n, self.batch_max, self.bucket_floor)
        x = np.stack([p.lb for p in batch])
        geos = np.asarray([p.geo for p in batch], dtype=np.float32)
        if run_n != n:  # pad to the bucket so executables stay bounded
            x = np.concatenate(
                [x, np.zeros((run_n - n,) + x.shape[1:], x.dtype)])
            geos = np.concatenate(
                [geos, np.tile([[1.0, 0, 0, 1, 1]], (run_n - n, 1)).astype(np.float32)])
        res = self.det.detect_prepared(x, geos, self.size, conf=self.conf,
                                       iou=self.iou, max_det=self.max_det)
        dets = self.det._trim(res, n)
        for p, d in zip(batch, dets):
            names = self.det.class_names
            p.result = {
                "boxes": d.boxes.tolist(),
                "obj": d.obj.tolist(),
                "cls_score": d.cls_score.tolist(),
                "cls_id": d.cls_id.tolist(),
                "names": [names[c] for c in d.cls_id],
            }
            p.event.set()


def make_server(detector, host: str = "127.0.0.1", port: int = 0,
                size: int = 416, conf: float = 0.5, iou: float = 0.4,
                max_det: int = 300, batch_max: int = 8,
                batch_timeout_ms: float = 5.0):
    """Build a ThreadingHTTPServer wired to a :class:`MicroBatcher`.

    Returns the server; call ``.serve_forever()`` (or run it in a thread —
    the tests do) and ``.batcher.close()`` + ``.shutdown()`` to stop."""
    import cv2
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from .utils.profiling import PipelineStats

    batcher = MicroBatcher(detector, size, conf, iou, max_det=max_det,
                           batch_max=batch_max,
                           batch_timeout_ms=batch_timeout_ms)
    stats = PipelineStats()
    stats.start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # route through logging, not stderr spam
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok",
                                 "classes": len(detector.class_names),
                                 "size": size, "batch_max": batch_max})
            elif self.path == "/stats":
                self._json(200, {"throughput_per_s": round(stats.throughput(), 3),
                                 "items": stats.items})
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/detect":
                self._json(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._json(400, {"error": "bad Content-Length"})
                return
            if length <= 0:
                self._json(400, {"error": "empty body: send image bytes"})
                return
            if length > MAX_BODY_BYTES:
                self._json(413, {"error": f"body {length} bytes exceeds cap "
                                          f"{MAX_BODY_BYTES}"})
                return
            raw = self.rfile.read(length)
            buf = np.frombuffer(raw, dtype=np.uint8)
            with stats.stage("decode"):
                img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
            if img is None:
                self._json(400, {"error": "could not decode image bytes"})
                return
            with stats.stage("detect"):
                p = batcher.submit(img)
                p.event.wait(timeout=60)
            if p.error is not None:
                self._json(500, {"error": p.error})
            elif p.result is None:
                self._json(504, {"error": "detection timed out"})
            else:
                stats.count()
                self._json(200, p.result)

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher
    server.stats = stats
    return server
