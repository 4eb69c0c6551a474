"""int8 conv-kernel attribution probe + Pallas int8 GEMM ceiling (round 3).

The round-3 scoreboard left exactly one structural int8 lever open: XLA's
W8A8 conv pairs measure 174-191 TOPS = 44-48% of the 394-TOPS v5e int8
peak (vs bf16 convs at 68% of their peak), and PERF.md's standing claim
is that hand kernels are the only remaining lever.  This probe tests that
claim before anyone spends a week on a conv kernel:

  A. control — re-run the r2 fp-requant-glue pairs (same-session tunnel
     weather control), B=16 and B=64;
  B. pure    — identical convs with a minimal integer-only chaining
     epilogue (shift+clip+int8 cast): is the 44-48% the CONV or the GLUE?
  C. intreq  — full fixed-point integer requant epilogue (mul/shift/
     select, the epilogue a Mosaic kernel would have to use — the
     toolchain rejects vector int<->float casts);
  D. xla_gemm — the 1x1-conv shapes expressed as plain int8 GEMMs with
     the integer epilogue (XLA's matmul lowering vs its conv lowering);
  E. pallas_gemm — a tiled Pallas s8xs8->s32 GEMM with the same integer
     epilogue, validated against a jnp ref twin in interpret mode first.
     Risky compile ordered LAST (Mosaic may reject int8 dot; a banked
     error row is itself the answer).

  python tools/int8_kernel_probe.py [--timeout 2400]
  PROBE_SKIP_TO=n resumes after a timeout (XLA compile cache makes
  retried steps cheap).

CPU smoke (no TPU touched): PROBE_INTERPRET=1 JAX_PLATFORMS=cpu
  python tools/int8_kernel_probe.py --timeout 600
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

CHILD = r"""
import functools, json, os, time
import numpy as np

def emit(**kw):
    print(json.dumps(kw), flush=True)

import bench
bench._honor_jax_platforms_env()
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_yolo_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

SKIP_TO = int(os.environ.get("PROBE_SKIP_TO", "0"))
INTERPRET = os.environ.get("PROBE_INTERPRET", "") == "1"
t_session = time.perf_counter()
emit(step="devices", devices=str(jax.devices()), backend=jax.default_backend())

REPS = 8 if INTERPRET else 80
OUTER = 2 if INTERPRET else 5
INT8_PEAK = 394e12  # v5e int8 TOPS (PERF.md)

def guard(step_id, name, fn):
    if step_id < SKIP_TO:
        emit(step=name, step_id=step_id, skipped=True)
        return None
    t0 = time.perf_counter()
    try:
        out = fn()
    except Exception as e:
        emit(step=name, step_id=step_id, error=repr(e)[:400])
        return None
    emit(step=name, step_id=step_id,
         seconds=round(time.perf_counter() - t0, 1), result=out)
    return out

def time_chain(jf, x, flops_per_iter):
    np.asarray(jf(x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(OUTER):
        out = jf(x)
    np.asarray(out)
    per = (time.perf_counter() - t0) / OUTER / REPS
    return {"iter_ms": round(per * 1e3, 4),
            "tops": round(flops_per_iter / per / 1e12, 1),
            "int8_peak_pct": round(100 * flops_per_iter / per / INT8_PEAK, 1)}

rng = np.random.default_rng(0)

def conv_i8(y, w, pad, stride=1):
    return lax.conv_general_dilated(
        y, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)

# Epilogues: all map int32 accum -> int8 activation for chaining.
def epi_fp(a):                      # r2 control: fp requant glue
    f = a.astype(jnp.float32) * 1e-4
    f = jnp.where(f > 0, f, 0.1 * f)
    return jnp.clip(jnp.round(f / 1e-2), -127, 127).astype(jnp.int8)

def epi_pure(a):                    # minimal int-only chaining
    return jnp.clip(a >> 7, -127, 127).astype(jnp.int8)

def epi_intreq(a, pre=10, m=181, sh=8):   # fixed-point requant + leaky-style
    scaled = (a >> pre) * jnp.int32(m)
    y = jnp.where(a > 0, scaled >> sh, scaled >> (sh + 3))
    return jnp.clip(y, -127, 127).astype(jnp.int8)

SHAPES = (("13 1024<->512", 13, 1024, 512), ("52 256<->128", 52, 256, 128))

def conv_pair_step(epi_name, epi, batch):
    rows = []
    for label, hw, cw, cn in SHAPES:
        xq = jax.device_put(rng.integers(-127, 128, (batch, hw, hw, cw)
                                         ).astype(np.int8))
        w1 = jnp.asarray(rng.integers(-127, 128, (1, 1, cw, cn)
                                      ).astype(np.int8))
        w3 = jnp.asarray(rng.integers(-127, 128, (3, 3, cn, cw)
                                      ).astype(np.int8))

        def pair(y):
            return epi(conv_i8(epi(conv_i8(y, w1, 0)), w3, 1))

        jf = jax.jit(lambda xx: lax.fori_loop(
            0, REPS, lambda _, y: pair(y), xx).astype(jnp.int32).sum())
        flops = 2 * batch * hw * hw * (cw * cn + 9 * cn * cw)
        row = {"label": label, "batch": batch, "epilogue": epi_name,
               **time_chain(jf, xq, flops)}
        emit(step="conv_pair", **row)
        rows.append(row)
    return rows

guard(1, "ctl_fp_b16", lambda: conv_pair_step("fp", epi_fp, 16))
guard(2, "ctl_fp_b64", lambda: conv_pair_step("fp", epi_fp, 64))
guard(3, "pure_b16", lambda: conv_pair_step("pure", epi_pure, 16))
guard(4, "pure_b64", lambda: conv_pair_step("pure", epi_pure, 64))
guard(5, "intreq_b16", lambda: conv_pair_step("intreq", epi_intreq, 16))

# ---- D/E. GEMM forms of the 1x1 shapes -----------------------------------
# (M, K, N): M = batch * spatial rounded to the 512-row kernel block.
GEMM_SHAPES = (("gemm13 K1024 N512", 4096, 1024, 512),
               ("gemm52 K256 N128", 32768, 256, 128))
if INTERPRET:
    GEMM_SHAPES = (("gemm-smoke", 1024, 256, 128),)

def gemm_pair_xla():
    rows = []
    for label, M, K, N in GEMM_SHAPES:
        xq = jax.device_put(rng.integers(-127, 128, (M, K)).astype(np.int8))
        w1 = jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int8))
        w2 = jnp.asarray(rng.integers(-127, 128, (N, K)).astype(np.int8))

        def mm(x, w):
            return lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

        def pair(y):
            return epi_intreq(mm(epi_intreq(mm(y, w1)), w2))

        jf = jax.jit(lambda xx: lax.fori_loop(
            0, REPS, lambda _, y: pair(y), xx).astype(jnp.int32).sum())
        row = {"label": label, **time_chain(jf, xq, 4 * M * K * N)}
        emit(step="xla_gemm", **row)
        rows.append(row)
    return rows

guard(6, "xla_gemm_int8", gemm_pair_xla)

# ---- Pallas int8 GEMM ----------------------------------------------------

def _gemm_i8_kernel(x_ref, w_ref, o_ref, *, pre, m, sh):
    acc = lax.dot_general(x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    scaled = (acc >> pre) * jnp.int32(m)
    y = jnp.where(acc > 0, scaled >> sh, scaled >> (sh + 3))
    o_ref[...] = jnp.clip(y, -127, 127).astype(jnp.int8)

def gemm_i8_pallas(x, w, bm=512, pre=10, m=181, sh=8, interpret=False):
    M, K = x.shape
    K2, N = w.shape
    assert K == K2 and M % bm == 0
    return pl.pallas_call(
        functools.partial(_gemm_i8_kernel, pre=pre, m=m, sh=sh),
        grid=(M // bm,),
        in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        interpret=interpret,
    )(x, w)

def gemm_i8_ref(x, w, pre=10, m=181, sh=8):
    acc = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return epi_intreq(acc, pre, m, sh)

def pallas_selfcheck():
    x = jnp.asarray(rng.integers(-127, 128, (1024, 256)).astype(np.int8))
    w = jnp.asarray(rng.integers(-127, 128, (256, 128)).astype(np.int8))
    got = np.asarray(gemm_i8_pallas(x, w, interpret=True))
    want = np.asarray(gemm_i8_ref(x, w))
    if not np.array_equal(got, want):
        raise AssertionError(f"interpret mismatch: {np.abs(got - want).max()}")
    return {"exact": True}

guard(7, "pallas_interpret_check", pallas_selfcheck)

def pallas_compile_small():
    # one-block compile canary before the big shapes (wedge containment)
    x = jnp.asarray(rng.integers(-127, 128, (512, 256)).astype(np.int8))
    w = jnp.asarray(rng.integers(-127, 128, (256, 128)).astype(np.int8))
    t0 = time.perf_counter()
    out = np.asarray(jax.jit(
        lambda a: gemm_i8_pallas(a, w, interpret=INTERPRET))(x))
    want = np.asarray(gemm_i8_ref(x, w))
    return {"compile_s": round(time.perf_counter() - t0, 1),
            "exact": bool(np.array_equal(out, want))}

guard(8, "pallas_compile_canary", pallas_compile_small)

def gemm_pair_pallas():
    rows = []
    for label, M, K, N in GEMM_SHAPES:
        xq = jax.device_put(rng.integers(-127, 128, (M, K)).astype(np.int8))
        w1 = jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int8))
        w2 = jnp.asarray(rng.integers(-127, 128, (N, K)).astype(np.int8))

        def pair(y):
            return gemm_i8_pallas(gemm_i8_pallas(y, w1, interpret=INTERPRET),
                                  w2, interpret=INTERPRET)

        jf = jax.jit(lambda xx: lax.fori_loop(
            0, REPS, lambda _, y: pair(y), xx).astype(jnp.int32).sum())
        row = {"label": label, **time_chain(jf, xq, 4 * M * K * N)}
        emit(step="pallas_gemm", **row)
        rows.append(row)
    return rows

guard(9, "pallas_gemm_int8", gemm_pair_pallas)

# ---- F. epilogue-variant ladder at B=64 on the large-spatial shapes ------
# First run showed: fp glue collapses the 52-sq pair at b64 (59 TOPS) while
# an int-only epilogue runs 231 TOPS and the deep 13-sq shape hits 306 (78%
# of peak) regardless.  Isolate WHICH part of the fp epilogue triggers the
# collapse, on the two shapes that dominate early-YOLOv3 conv time.

def ladder_variants(cn):
    ws = jnp.asarray(rng.random((1, 1, 1, cn)).astype(np.float32) * 1e-4)
    bias = jnp.asarray(rng.random((cn,)).astype(np.float32))

    def v_pure(a):
        return jnp.clip(a >> 7, -127, 127).astype(jnp.int8)

    def v_fp_min(a):          # scalar scale, no bias/leaky, round
        f = a.astype(jnp.float32) * 1e-4
        return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

    def v_fp_noround(a):      # scalar scale, truncating cast
        f = a.astype(jnp.float32) * 1e-4
        return jnp.clip(f, -127.0, 127.0).astype(jnp.int8)

    def v_fp_perchan(a):      # per-channel scale, no bias/leaky, round
        f = a.astype(jnp.float32) * ws
        return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

    def v_fp_prod(a):         # exact production resident epilogue shape
        f = a.astype(jnp.float32) * ws + bias
        f = jnp.where(f > 0, f, 0.1 * f)
        return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

    def v_intreq(a):
        return epi_intreq(a)

    return [("pure", v_pure), ("fp_min", v_fp_min),
            ("fp_noround", v_fp_noround), ("fp_perchan", v_fp_perchan),
            ("fp_prod", v_fp_prod), ("intreq", v_intreq)]

def epilogue_ladder(label, hw, cw, cn, batch=64):
    rows = []
    xq = jax.device_put(rng.integers(-127, 128, (batch, hw, hw, cw)
                                     ).astype(np.int8))
    w1 = jnp.asarray(rng.integers(-127, 128, (1, 1, cw, cn)).astype(np.int8))
    w3 = jnp.asarray(rng.integers(-127, 128, (3, 3, cn, cw)).astype(np.int8))
    flops = 2 * batch * hw * hw * (cw * cn + 9 * cn * cw)
    for vname, epi_a in ladder_variants(cn):
        # second conv returns to cw channels: rebuild variant for that width
        epi_b = dict(ladder_variants(cw))[vname]

        def pair(y):
            return epi_b(conv_i8(epi_a(conv_i8(y, w1, 0)), w3, 1))

        jf = jax.jit(lambda xx: lax.fori_loop(
            0, REPS, lambda _, y: pair(y), xx).astype(jnp.int32).sum())
        row = {"label": label, "variant": vname, "batch": batch,
               **time_chain(jf, xq, flops)}
        emit(step="epilogue_ladder", **row)
        rows.append(row)
    return rows

guard(10, "ladder_52_b64", lambda: epilogue_ladder("52 256<->128", 52, 256, 128))
guard(11, "ladder_104_b64", lambda: epilogue_ladder("104 128<->64", 104, 128, 64))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--out", default="/root/repo/perf/int8_probe_r3.jsonl")
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
