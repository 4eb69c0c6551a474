"""W8A8 dynamic-range quantization (ops/quant.py) — numerics + API.

Beyond-reference serving feature (PERF.md roadmap #7): correctness here means
(a) the quantizer's reconstruction obeys the symmetric-int8 error bound,
(b) the quantized forward tracks the fp32 forward within the drift expected
of 8-bit dynamic ranging, and (c) the Detector integration round-trips.
Real-weight mAP validation is deferred until real assets exist (SURVEY.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_yolo_tpu as pyt
from pytorch_yolo_tpu.config import ConvSpec
from pytorch_yolo_tpu.models.darknet import build_forward
from pytorch_yolo_tpu.models.zoo import model_spec
from pytorch_yolo_tpu.ops.quant import (head_conv_indices, quantize_params,
                                        quantized_conv)
from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params


@pytest.fixture(scope="module")
def tiny():
    spec = model_spec("yolov3-tiny")
    params = fold_batchnorm(spec, random_raw_params(spec, seed=3))
    return spec, {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                  for k, v in params.items()}


def test_quantizer_reconstruction_bound(tiny):
    spec, params = tiny
    qp = quantize_params(spec, params, skip_layers=())
    for layer in spec.layers:
        if not isinstance(layer, ConvSpec):
            continue
        q = qp[layer.index]
        assert q["wq"].dtype == jnp.int8
        assert (np.asarray(q["ws"]) > 0).all()
        # symmetric per-channel quant: |w - wq*ws| <= ws/2 everywhere
        err = np.abs(params[layer.index]["w"]
                     - np.asarray(q["wq"], np.float32) * np.asarray(q["ws"]))
        assert (err <= np.asarray(q["ws"]) / 2 + 1e-7).all()


def test_head_conv_indices():
    for name, n_heads in (("yolov3-tiny", 2), ("yolov3", 3), ("yolov2", 1)):
        spec = model_spec(name)
        idx = head_conv_indices(spec)
        assert len(idx) == n_heads
        for i in idx:
            layer = spec.layers[i]
            assert isinstance(layer, ConvSpec)
            assert layer.activation == "linear" and not layer.batch_normalize


def test_forward_drift_bounded(tiny):
    spec, params = tiny
    jparams = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
               for k, v in params.items()}
    x = jnp.asarray(np.random.default_rng(1).random((1, 416, 416, 3), np.float32))
    heads_fp = build_forward(spec)(jparams, x)

    def drift(skip):
        qp = quantize_params(spec, params, skip_layers=skip)
        heads_q = build_forward(spec, quant="w8a8")(qp, x)
        means, p99s = [], []
        for f, q in zip(heads_fp, heads_q):
            f, q = np.asarray(f), np.asarray(q)
            rel = np.abs(f - q) / (np.abs(f) + 1.0)
            means.append(rel.mean())
            p99s.append(np.quantile(rel, 0.99))
        return max(means), max(p99s)

    # all-quantized: measured ~0.024 mean / ~0.10 p99 with synthetic weights;
    # a broken scale or layout moves these by orders of magnitude
    m_all, p_all = drift(())
    assert m_all < 0.06, m_all
    assert p_all < 0.25, p_all
    # default (heads kept fp) must drift strictly less at the outputs
    m_heads, p_heads = drift("heads")
    assert m_heads < m_all
    assert p_heads <= p_all


def test_skip_layers_keep_fp_path(tiny):
    spec, params = tiny
    conv_idx = [l.index for l in spec.layers if isinstance(l, ConvSpec)]
    qp = quantize_params(spec, params, skip_layers=set(conv_idx))
    assert all("wq" not in qp[i] for i in conv_idx)
    x = jnp.asarray(np.random.default_rng(2).random((1, 416, 416, 3), np.float32))
    jparams = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
               for k, v in params.items()}
    # all-skipped quant forward is bit-identical to the fp forward
    a = build_forward(spec)(jparams, x)
    b = build_forward(spec, quant="w8a8")(
        {k: {kk: jnp.asarray(vv) for kk, vv in v.items()} for k, v in qp.items()}, x)
    for f, q in zip(a, b):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(q))


def test_detector_quant_end_to_end(tiny):
    spec, params = tiny
    det_fp = pyt.Detector(spec, params)
    det_q = pyt.Detector(spec, params, quant="w8a8")
    img = np.random.default_rng(0).integers(0, 256, (480, 640, 3), dtype=np.uint8)
    a = det_fp.detect(img, conf=0.5)
    b = det_q.detect(img, conf=0.5)
    assert abs(len(a) - len(b)) <= max(3, int(0.05 * len(a)))
    # the kept sets overlap: most int8 boxes sit on an fp box
    if len(a) and len(b):
        d = np.abs(b.boxes[:, None, :] - a.boxes[None, :, :]).max(-1).min(1)
        # synthetic weights put many candidates right at the conf boundary,
        # so 8-bit drift legitimately swaps some keeps (measured ~88% within
        # 8 px); a broken quant path drops this to ~0
        assert (d < 12.0).mean() > 0.8  # px in original coords


def test_quant_checkpoint_guard_and_bad_mode(tiny):
    spec, params = tiny
    det_q = pyt.Detector(spec, params, quant="w8a8",
                         cfg_text="unused-but-required")
    with pytest.raises(ValueError, match="quantized"):
        det_q.save_checkpoint("/tmp/should_not_exist.ckpt")
    with pytest.raises(ValueError, match="quant"):
        build_forward(spec, quant="int4")


# ---------------------------------------------------------------------------
# Static (calibrated) activation scales
# ---------------------------------------------------------------------------


def test_static_sx_matches_dynamic_single_conv(tiny):
    """quantized_conv(sx=<the dynamic scale>) is bit-identical to the
    dynamic path — the static mode only changes WHERE the scale comes from."""
    spec, params = tiny
    conv0 = spec.layers[0]
    qp = quantize_params(spec, params, skip_layers=())
    p = qp[conv0.index]
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                    jnp.float32)
    sx = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
    dyn = quantized_conv(x, p["wq"], p["ws"], p["b"], conv0)
    sta = quantized_conv(x, p["wq"], p["ws"], p["b"], conv0, sx=sx)
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(sta))


def test_collect_act_scales_covers_convs(tiny):
    from pytorch_yolo_tpu.config import ConvSpec as CS
    from pytorch_yolo_tpu.ops.quant import collect_act_scales

    spec, params = tiny
    x = np.random.default_rng(1).random((2, 96, 96, 3)).astype(np.float32)
    scales = collect_act_scales(spec, params, x)
    conv_idx = {l.index for l in spec.layers if isinstance(l, CS)}
    assert set(scales) == conv_idx
    assert all(s > 0 for s in scales.values())
    # conv0 sees the raw input: its scale is max|x|/127 exactly
    np.testing.assert_allclose(scales[0], np.abs(x).max() / 127.0, rtol=1e-6)


def test_detector_static_int8_end_to_end(tiny):
    """Detector(quant, quant_calib=...) bakes static scales ("sa" in the
    pytree, no dynamic reductions) and stays close to dynamic int8."""
    spec, params = tiny
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 256, (200, 260, 3), dtype=np.uint8)
            for _ in range(2)]
    dyn = pyt.Detector(spec, params, quant="w8a8")
    sta = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs)
    quantized = [k for k, p in sta.params.items() if "wq" in p]
    assert quantized and all("sa" in sta.params[k] for k in quantized)
    assert not any("sa" in dyn.params[k] for k in quantized)
    da = dyn.detect(imgs[0], size=320, conf=0.3)
    sb = sta.detect(imgs[0], size=320, conf=0.3)
    # same candidate geometry; scores may differ at int8-rounding scale
    assert da.boxes.shape[1] == sb.boxes.shape[1] == 4
    assert abs(len(da.boxes) - len(sb.boxes)) <= max(3, len(da.boxes) // 4)


def test_calib_rejects_prequantized(tiny):
    spec, params = tiny
    qp = quantize_params(spec, params)
    with pytest.raises(ValueError, match="pre-quantized"):
        pyt.Detector(spec, qp, quant="w8a8",
                     quant_calib=[np.zeros((64, 64, 3), np.uint8)])
