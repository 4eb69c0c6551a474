"""A/B the new int8 serving defaults on hardware (round 3, follow-up to the
stage profile).

perf/int8_stage_profile_r3.jsonl attributed the int8s b64 pipeline: the
early large-spatial stages (conv0 + 208-sq + 104-sq) ran SLOWER quantized
than in bf16 (requant overhead, no MXU gain), and the S2D stem was off
under quant (conv0 alone ~3.8 ms of a 39 ms floor-free forward).  The
fixes under test, per family at b64:

  ctl        int8s, EARLY_STRIDE=0, STEM_S2D=0  (exact round-3 config)
  earlyskip  int8s + early-layer skip, natural stem
  default    int8s + early skip + s2d stem     (new library default)
  bf16glue   int8sb: static int8 core, bf16 for the skipped layers/heads
  bf16       same-session bf16 control (tunnel weather)

plus drift rows for the changed configs (measure_drift picks up the new
default automatically; the ctl drift is the banked round-3 row).

  python tools/int8_serving_ab_r3.py [--timeout 2700]
  AB_SKIP_TO=n resumes.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

CHILD = r"""
import json, os, time
import numpy as np

def emit(**kw):
    print(json.dumps(kw), flush=True)

import bench
bench._honor_jax_platforms_env()
import jax

from pytorch_yolo_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

SKIP_TO = int(os.environ.get("AB_SKIP_TO", "0"))
t_session = time.perf_counter()
emit(step="devices", devices=str(jax.devices()), backend=jax.default_backend())

B, ITERS = 64, 10

def guard(step_id, name, fn, env=None):
    if step_id < SKIP_TO:
        emit(step=name, step_id=step_id, skipped=True)
        return None
    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    t0 = time.perf_counter()
    try:
        out = fn()
    except Exception as e:
        emit(step=name, step_id=step_id, error=repr(e)[:400])
        return None
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    emit(step=name, step_id=step_id,
         seconds=round(time.perf_counter() - t0, 1), result=out)
    return out

CTL = {"PYTORCH_YOLO_INT8_EARLY_STRIDE": "0", "PYTORCH_YOLO_STEM_S2D": "0"}
EARLY_ONLY = {"PYTORCH_YOLO_STEM_S2D": "0"}
DEFAULT = {}

def compute(model, dtype):
    return lambda: bench.measure_compute(model, 416, B, ITERS, dtype, "default")

# ---- yolov3 (flagship) ----------------------------------------------------
guard(1, "v3_int8s_ctl_r3config", compute("yolov3", "int8s"), CTL)
guard(2, "v3_int8s_earlyskip", compute("yolov3", "int8s"), EARLY_ONLY)
guard(3, "v3_int8s_default_early_s2d", compute("yolov3", "int8s"), DEFAULT)
guard(4, "v3_int8sb_bf16glue", compute("yolov3", "int8sb"), DEFAULT)
guard(5, "v3_bf16_control", compute("yolov3", "bfloat16"), DEFAULT)

# ---- yolov3-tiny (conv_pool family: early ladders were the r3 win) --------
guard(6, "tiny_int8s_ctl_r3config", compute("yolov3-tiny", "int8s"), CTL)
guard(7, "tiny_int8s_earlyskip", compute("yolov3-tiny", "int8s"), DEFAULT)
guard(8, "tiny_int8sb_bf16glue", compute("yolov3-tiny", "int8sb"), DEFAULT)
guard(9, "tiny_bf16_control", compute("yolov3-tiny", "bfloat16"), DEFAULT)

# ---- yolov2 ---------------------------------------------------------------
guard(10, "v2_int8s_ctl_r3config", compute("yolov2", "int8s"), CTL)
guard(11, "v2_int8s_earlyskip", compute("yolov2", "int8s"), DEFAULT)
guard(12, "v2_int8sb_bf16glue", compute("yolov2", "int8sb"), DEFAULT)

# ---- drift of the changed configs (new default read from env) -------------
guard(13, "drift_v3_new_default", lambda: bench.measure_drift("yolov3", 416, 2))

def drift_int8sb():
    import jax.numpy as jnp
    from pytorch_yolo_tpu.api import Detector
    from pytorch_yolo_tpu.utils.drift import measure_mode_drift

    ref = Detector.load("yolov3")
    host = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
            for k, v in ref.params.items()}
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
            for _ in range(2)]
    det = Detector(ref.spec, host, quant="w8a8", quant_calib=imgs,
                   quant_recipe="none",
                   compute_dtype=jnp.bfloat16, precision="default")
    s = measure_mode_drift(ref, det, imgs, size=416)
    emit(step="drift", mode="int8sb(early+s2d+bf16glue)", detail=s.row())
    return {"set_agreement": round(s.set_agreement, 4),
            "box_p99_px": round(s.box_p99_px, 3)}

guard(14, "drift_v3_int8sb", drift_int8sb)

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=2700)
    ap.add_argument("--out", default="/root/repo/perf/int8_serving_ab_r3.jsonl")
    args = ap.parse_args()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    done = False
    with open(args.out, "a") as sink, \
            open(args.out + ".stderr", "a") as err_sink:
        proc = subprocess.Popen([sys.executable, "-u", "-c", CHILD],
                                stdout=subprocess.PIPE, stderr=err_sink,
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
