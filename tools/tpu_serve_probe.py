"""First hardware measurement of the HTTP serve path (VERDICT r4 #6).

serve.py's micro-batcher (pow2 bucket ladder, warmup precompile, uint8
end-to-end) had never produced a TPU number — all serving evidence was
detect/bench-path.  This probe:

  1. starts ``python -m pytorch_yolo_tpu serve`` as THE single TPU
     process (single-tenant rule: the parent never imports jax);
  2. waits for /healthz (bounded by --timeout — startup pays grant
     acquisition + the warmup ladder's pipeline compiles, 2-7 min/fresh
     bucket worst-case, cached after);
  3. measures the FIRST request's latency separately — if the warmup
     ladder does its job it lands in the steady distribution instead of
     paying a compile;
  4. runs client load at several concurrency points (stdlib urllib
     threads), recording p50/p95 latency + req/s per point;
  5. snapshots GET /stats and shuts the server down with SIGINT (the
     serve loop's graceful path — never SIGKILL a live TPU client, its
     grant poisons the queue for the next acquisition; CLAUDE.md).

Caveat for reading the numbers: this container has ONE CPU core, so
client threads, server-side cv2 decode/letterbox, and dispatch all share
it — the throughput rows are a lower bound dominated by host work at high
concurrency, while the latency distribution and the warmup check are the
real payload.

  python tools/tpu_serve_probe.py [--model yolov3] [--reso 416]
      [--batch 8] [--timeout 3600] [--out perf/serve_probe_r5.jsonl]
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import os
import signal
import subprocess
import sys
import tempfile
import time
import urllib.error
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def emit(sink, **kw):
    line = json.dumps(kw)
    print(line, flush=True)
    sink.write(line + "\n")
    sink.flush()


def make_jpeg(path: str) -> bytes:
    import cv2
    import numpy as np

    img = np.random.default_rng(0).integers(0, 256, (480, 640, 3),
                                            dtype=np.uint8)
    cv2.imwrite(path, img)
    with open(path, "rb") as f:
        return f.read()


def post(url: str, payload: bytes, timeout: float = 300.0) -> tuple[float, dict]:
    req = urllib.request.Request(f"{url}/detect", data=payload, method="POST")
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        out = json.loads(r.read())
    return time.perf_counter() - t0, out


def load_point(url: str, payload: bytes, concurrency: int, requests: int) -> dict:
    import numpy as np

    lat: list[float] = []
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(concurrency) as pool:
        for dt, _ in pool.map(lambda _: post(url, payload), range(requests)):
            lat.append(dt)
    wall = time.perf_counter() - t0
    a = np.asarray(lat) * 1000.0
    return {"concurrency": concurrency, "requests": requests,
            "req_per_s": round(requests / wall, 2),
            "p50_ms": round(float(np.percentile(a, 50)), 1),
            "p95_ms": round(float(np.percentile(a, 95)), 1),
            "max_ms": round(float(a.max()), 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--reso", type=int, default=416)
    ap.add_argument("--batch", type=int, default=8,
                    help="server batch_max (ladder = pow2 buckets up to it)")
    ap.add_argument("--port", type=int, default=18273)
    ap.add_argument("--timeout", type=float, default=3600,
                    help="startup bound (grant + warmup compiles)")
    ap.add_argument("--out", default="perf/serve_probe_r5.jsonl")
    ap.add_argument("--int8", action="store_true",
                    help="serve --int8 --bf16 instead of plain --bf16")
    ap.add_argument("--int8-calib", default=None, metavar="DIR",
                    help="calibrate static scales from DIR (the "
                         "recommended serving mode; without it --int8 "
                         "serves dynamic scales)")
    args = ap.parse_args()

    url = f"http://127.0.0.1:{args.port}"
    with tempfile.TemporaryDirectory() as td:
        payload = make_jpeg(os.path.join(td, "probe.jpg"))

    cmd = [sys.executable, "-m", "pytorch_yolo_tpu", "serve",
           "--model", args.model, "--reso", str(args.reso),
           "--port", str(args.port), "--batch", str(args.batch), "--bf16"]
    if args.int8:
        cmd.append("--int8")
    if args.int8_calib:
        cmd += ["--int8-calib", args.int8_calib]
    mode = ("int8sb-static" if args.int8 and args.int8_calib
            else "int8sb-dynamic" if args.int8 else "bf16")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    sink = open(args.out, "a")
    emit(sink, step="start", model=args.model, reso=args.reso,
         batch_max=args.batch, mode=mode, cmd=" ".join(cmd))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    log_path = args.out + ".server.log"
    server_log = open(log_path, "a")
    t_start = time.perf_counter()
    proc = subprocess.Popen(cmd, cwd=REPO, env=env, stdout=server_log,
                            stderr=server_log)
    rc = 0
    try:
        # ---- wait for /healthz (startup = grant + warmup ladder) -------
        deadline = time.time() + args.timeout
        up = False
        while time.time() < deadline:
            if proc.poll() is not None:
                emit(sink, step="error",
                     error=f"server exited rc={proc.returncode} during "
                           f"startup (see {log_path})")
                return 1
            try:
                with urllib.request.urlopen(f"{url}/healthz", timeout=5) as r:
                    health = json.loads(r.read())
                up = True
                break
            except (urllib.error.URLError, ConnectionError, OSError):
                time.sleep(2.0)
        if not up:
            emit(sink, step="error", error="startup timeout")
            rc = 1
            return rc
        t_up = round(time.perf_counter() - t_start, 1)
        emit(sink, step="healthz", startup_s=t_up, health=health)

        # ---- first-request latency: the warmup-ladder check ------------
        dt, out = post(url, payload)
        emit(sink, step="first_request", latency_ms=round(dt * 1000, 1),
             n_boxes=len(out.get("boxes", [])))

        # ---- load points ------------------------------------------------
        for conc, n in ((1, 32), (4, 64), (8, 128), (16, 128)):
            row = load_point(url, payload, conc, n)
            emit(sink, step=f"load_c{conc}", **row)

        with urllib.request.urlopen(f"{url}/stats", timeout=30) as r:
            emit(sink, step="stats", stats=json.loads(r.read()))
        emit(sink, step="done",
             total_s=round(time.perf_counter() - t_start, 1))
    finally:
        # graceful shutdown only: SIGINT -> serve loop exits + batcher
        # closes; give it a long leash before escalating (a SIGKILLed
        # TPU client wedges the next grant for many minutes).
        if proc.poll() is None:
            proc.send_signal(signal.SIGINT)
            try:
                proc.wait(timeout=300)
            except subprocess.TimeoutExpired:
                emit(sink, step="warning",
                     warning="server ignored SIGINT for 300s; terminating")
                proc.terminate()
                try:
                    proc.wait(timeout=120)
                except subprocess.TimeoutExpired:
                    proc.kill()
        server_log.close()
        sink.close()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
