"""Floor-free stage micro-costs: letterbox / decode / NMS (round 3).

The round-2 prefix profiles carry a 2.7-9 ms per-call dispatch floor over
the tunnel, which swamps sub-5-ms stages (PERF.md measurement caveats).
This tool times each non-forward pipeline stage CHAINED inside one jit
(the loop-control methodology from r2 sessions 19-21): per-iteration
input is perturbed by the loop index so XLA cannot hoist the body out of
the fori_loop.

Decides whether the letterbox / postprocess stages are worth further
kernel work (e.g. bf16 resize), with real numbers instead of
floor-contaminated prefixes.

  python tools/stage_micro_r3.py [--timeout 900]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

CHILD = r"""
import json, time
import numpy as np

import bench
bench._honor_jax_platforms_env()
import jax
import jax.numpy as jnp
from jax import lax

from pytorch_yolo_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

def emit(**kw):
    print(json.dumps(kw), flush=True)

emit(step="devices", devices=str(jax.devices()))

B = 16
REPS = 40
rng = np.random.default_rng(0)
imgs = jax.device_put(rng.integers(0, 256, (B, 480, 640, 3), dtype=np.uint8))

def timed(name, build, arg, reps=REPS, outer=5, flops=None):
    jf = jax.jit(build)
    np.asarray(jf(arg))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(outer):
        out = jf(arg)
    np.asarray(out)
    per = (time.perf_counter() - t0) / outer / reps * 1e3
    row = {"name": name, "ms_per_iter": round(per, 4),
           "ms_per_img": round(per / B, 5)}
    if flops is not None:
        row["tflops"] = round(flops / (per / 1e3) / 1e12, 2)
    emit(step="stage_micro", **row)
    return per

# ---- letterbox (u8 raw frame -> f32 416 canvas), current implementation --
from pytorch_yolo_tpu.ops.preprocess import letterbox_batch

def lb_chain(x):
    def body(i, acc):
        # perturb input per iteration so the loop body is not invariant
        y = letterbox_batch(x + i.astype(jnp.uint8), size=416)
        return acc + y[0, 0, 0, 0]
    return lax.fori_loop(0, REPS, body, jnp.float32(0.0))

timed("letterbox_u8_480x640_to_416_b16", lb_chain, imgs)

# ---- resize core only, f32 vs bf16 --------------------------------------
xf = jnp.asarray(rng.random((B, 480, 640, 3)).astype(np.float32))

def resize_chain(dtype):
    def fn(x):
        def body(i, acc):
            y = jax.image.resize(x.astype(dtype) + i.astype(dtype),
                                 (B, 312, 416, 3), method="linear",
                                 antialias=False)
            return acc + y[0, 0, 0, 0].astype(jnp.float32)
        return lax.fori_loop(0, REPS, body, jnp.float32(0.0))
    return fn

timed("resize_f32", resize_chain(jnp.float32), xf)
timed("resize_bf16", resize_chain(jnp.bfloat16), xf)

# ---- decode + NMS on random heads (yolov3@416, b16) ----------------------
from pytorch_yolo_tpu.models.darknet import head_shapes
from pytorch_yolo_tpu.models.zoo import model_spec
from pytorch_yolo_tpu.ops.nms import batched_nms_fused
from pytorch_yolo_tpu.ops.pallas_kernels import decode_score_all

spec = model_spec("yolov3")
heads = tuple(jax.device_put(rng.normal(size=s).astype(np.float32))
              for s in head_shapes(spec, 416, batch=B))

def decode_chain(hs):
    def body(i, acc):
        shifted = tuple(h + i.astype(jnp.float32) * 1e-6 for h in hs)
        rows = decode_score_all(shifted, spec, 416)
        return acc + rows[0, 0, 0]
    return lax.fori_loop(0, REPS, body, jnp.float32(0.0))

def decode_nms_chain(hs):
    def body(i, acc):
        shifted = tuple(h + i.astype(jnp.float32) * 1e-6 for h in hs)
        rows = decode_score_all(shifted, spec, 416)
        res = batched_nms_fused(rows, conf_thresh=0.6, iou_thresh=0.45,
                                max_det=300)
        return acc + res.boxes[0, 0, 0] + res.valid.astype(jnp.float32).sum()
    return lax.fori_loop(0, REPS, body, jnp.float32(0.0))

timed("decode_pallas_b16", decode_chain, heads, reps=REPS)
timed("decode_plus_nms_b16", decode_nms_chain, heads, reps=REPS)

emit(step="done")
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--out", default="/root/repo/perf/stage_micro_r3.jsonl")
    args = ap.parse_args()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    done = False
    with open(args.out, "a") as sink:
        proc = subprocess.Popen([sys.executable, "-u", "-c", CHILD],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL,
                                text=True, env=env, cwd=repo)
        import threading

        timer = threading.Timer(args.timeout, proc.kill)
        timer.daemon = True
        timer.start()
        try:
            for line in proc.stdout:
                sys.stdout.write(line)
                sys.stdout.flush()
                sink.write(line)
                sink.flush()
                if '"step": "done"' in line:
                    done = True
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        finally:
            timer.cancel()
    return 0 if done else 1


if __name__ == "__main__":
    raise SystemExit(main())
