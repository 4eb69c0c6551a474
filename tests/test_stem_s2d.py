"""Space-to-depth stem transform (models/darknet.py stem_s2d) parity.

The transform is a pure re-parameterization of the first two convs
(MLPerf-ResNet-style, adapted to Darknet-53's s1+s2 stem — PERF.md roadmap
#3): every head output must match the untransformed forward up to fp
reduction-order noise, on every applicable model, dtype, and input size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_yolo_tpu.config import build_spec, parse_cfg_text
from pytorch_yolo_tpu.models.darknet import (
    build_forward,
    stem_s2d_applicable,
)
from pytorch_yolo_tpu.models.zoo import model_spec
from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params


def _params(spec, seed=0):
    return jax.tree_util.tree_map(
        jnp.asarray, fold_batchnorm(spec, random_raw_params(spec, seed=seed)))


def test_applicability_table():
    from pytorch_yolo_tpu.models.darknet import _stem_pattern

    assert _stem_pattern(model_spec("yolov3")) == "conv_conv"
    assert _stem_pattern(model_spec("yolov3-spp")) == "conv_conv"
    # tiny/v2 start conv + 2x2/s2 maxpool — the pool becomes a phase max
    assert _stem_pattern(model_spec("yolov3-tiny")) == "conv_pool"
    assert _stem_pattern(model_spec("yolov2-tiny")) == "conv_pool"
    assert _stem_pattern(model_spec("yolov2")) == "conv_pool"
    assert stem_s2d_applicable(model_spec("yolov3-tiny"))


@pytest.mark.parametrize("model,n_heads",
                         [("yolov3", 3), ("yolov3-tiny", 2), ("yolov2", 1)])
def test_stem_exactness_f64(model, n_heads):
    """The re-parameterization itself is exact for BOTH stem patterns
    (conv_conv and conv_pool): in float64 (reduction-order noise ~1e-16, so
    the deep-net chaotic amplification seen in fp32 stays ~1e-10) both
    paths' heads must agree to ~1e-8."""
    spec = model_spec(model)
    jax.config.update("jax_enable_x64", True)
    try:
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a, dtype=np.float64)),
            fold_batchnorm(spec, random_raw_params(spec, seed=0)))
        x = jnp.asarray(np.random.default_rng(0).random((1, 128, 128, 3)))
        base = build_forward(spec, compute_dtype=jnp.float64)(params, x)
        s2d = build_forward(spec, compute_dtype=jnp.float64,
                            stem_s2d=True)(params, x)
        assert len(base) == len(s2d) == n_heads
        for hb, hs in zip(base, s2d):
            np.testing.assert_allclose(np.asarray(hb), np.asarray(hs),
                                       rtol=1e-8, atol=1e-8)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("model", ["yolov3", "yolov3-tiny"])
def test_stem_local_parity_fp32(model):
    """Layer-1 output (the transform's boundary) matches the natural stem
    to fp32 rounding — amplification through the rest of the net is a
    property of random-weight chaos, not of the transform (see f64 test).
    conv_pool's phase max is bit-exact (no arithmetic reordering at all)."""
    spec = model_spec(model)
    params = _params(spec)
    x = jnp.asarray(np.random.default_rng(0).random((1, 128, 128, 3)),
                    dtype=jnp.float32)
    base = build_forward(spec, stop_at=1)(params, x)[0]
    s2d = build_forward(spec, stem_s2d=True, stop_at=1)(params, x)[0]
    np.testing.assert_allclose(np.asarray(base), np.asarray(s2d),
                               rtol=1e-4, atol=1e-5)


def test_rejects_inapplicable_and_quant():
    # a stem whose first conv is 1x1 admits no transform
    cfg = parse_cfg_text(
        "[net]\nwidth=64\nheight=64\nchannels=3\n"
        "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=1\nstride=1\npad=1\nactivation=leaky\n"
        "[maxpool]\nsize=2\nstride=2\n")
    with pytest.raises(ValueError, match="stem pattern"):
        build_forward(build_spec(cfg), stem_s2d=True)
    # quant composes with s2d ONLY when the stem convs themselves keep fp
    # kernels (the default early-layer skip guarantees that); a fully
    # quantized stem has nothing to pack and must fail loudly at trace time
    spec = model_spec("yolov3")
    from pytorch_yolo_tpu.ops.quant import quantize_params
    from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params

    params = fold_batchnorm(spec, random_raw_params(spec, seed=7))
    qp = quantize_params(spec, params, skip_layers="heads")  # stem quantized
    fwd = build_forward(spec, quant="w8a8", stem_s2d=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="fp stem kernels"):
        fwd({k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
             for k, v in qp.items()}, x)


def test_rejects_routed_stem():
    # A cfg whose route consumes layer 0 must not be transformed.
    cfg = parse_cfg_text(
        "[net]\nwidth=64\nheight=64\nchannels=3\n"
        "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\nstride=1\npad=1\nactivation=leaky\n"
        "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\nstride=2\npad=1\nactivation=leaky\n"
        "[route]\nlayers=0\n")
    spec = build_spec(cfg)
    assert not stem_s2d_applicable(spec)


def test_detector_stem_s2d_end_to_end():
    from pytorch_yolo_tpu.api import Detector

    spec = model_spec("yolov3")
    params = fold_batchnorm(spec, random_raw_params(spec, seed=2))
    base = Detector(spec, params)
    fast = Detector(spec, params, stem_s2d=True)
    assert fast.stem_s2d and not base.stem_s2d
    img = np.random.default_rng(2).integers(0, 256, (96, 128, 3), dtype=np.uint8)
    db = base.detect(img, size=128, conf=0.1)
    ds = fast.detect(img, size=128, conf=0.1)
    assert db.boxes.shape == ds.boxes.shape
    np.testing.assert_allclose(db.boxes, ds.boxes, rtol=1e-4, atol=1e-3)


@pytest.mark.filterwarnings(
    # the f64 construction below intentionally runs with x64 disabled — only
    # the stem_s2d policy decision is under test, not f64 math
    "ignore:Explicitly requested dtype float64")
def test_default_and_env_policy(monkeypatch):
    from pytorch_yolo_tpu.api import Detector

    spec = model_spec("yolov3")
    params = fold_batchnorm(spec, random_raw_params(spec, seed=3))
    monkeypatch.delenv("PYTORCH_YOLO_STEM_S2D", raising=False)
    # default: off for the fp32 parity mode, on for reduced-precision serving
    assert not Detector(spec, params).stem_s2d
    assert Detector(spec, params, compute_dtype=jnp.bfloat16,
                    precision="default").stem_s2d
    # int8 + fp32 glue: early skip off (measured loss) -> stem quantized ->
    # no s2d; int8 + bf16 glue: early skip keeps the stem fp -> s2d ON
    # (the measured-fastest yolov3 mode, perf/int8_serving_ab_r3.jsonl)
    assert not Detector(spec, params, quant="w8a8").stem_s2d
    assert Detector(spec, params, quant="w8a8", compute_dtype=jnp.bfloat16,
                    precision="default").stem_s2d
    # env force-on (even fp32) / force-off (even bf16)
    monkeypatch.setenv("PYTORCH_YOLO_STEM_S2D", "1")
    assert Detector(spec, params).stem_s2d
    monkeypatch.setenv("PYTORCH_YOLO_STEM_S2D", "0")
    assert not Detector(spec, params, compute_dtype=jnp.bfloat16,
                        precision="default").stem_s2d
    # tiny is transformable (conv_pool) but measured slower on TPU -> the
    # auto default keeps it OFF; env=1 opts in
    tiny = model_spec("yolov3-tiny")
    tparams = fold_batchnorm(tiny, random_raw_params(tiny, seed=3))
    monkeypatch.delenv("PYTORCH_YOLO_STEM_S2D")
    assert not Detector(tiny, tparams, compute_dtype=jnp.bfloat16,
                        precision="default").stem_s2d
    monkeypatch.setenv("PYTORCH_YOLO_STEM_S2D", "1")
    assert Detector(tiny, tparams, compute_dtype=jnp.bfloat16,
                    precision="default").stem_s2d
    monkeypatch.delenv("PYTORCH_YOLO_STEM_S2D")
    # f64 (exactness pinning) must keep the reference reduction order
    assert not Detector(spec, params, compute_dtype=jnp.float64).stem_s2d
