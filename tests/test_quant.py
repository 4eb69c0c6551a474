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


# ---------------------------------------------------------------------------
# Calibration options (margin / percentile) — VERDICT r2 #5
# ---------------------------------------------------------------------------


def test_collect_act_scales_margin_and_percentile(tiny):
    from pytorch_yolo_tpu.ops.quant import collect_act_scales

    spec, params = tiny
    x = np.random.default_rng(3).random((2, 96, 96, 3)).astype(np.float32)
    base = collect_act_scales(spec, params, x)
    # margin multiplies every scale linearly
    wide = collect_act_scales(spec, params, x, margin=1.25)
    for k in base:
        np.testing.assert_allclose(wide[k], base[k] * 1.25, rtol=1e-6)
    # a percentile below 100 never exceeds the max-calibrated scale, and an
    # outlier activation no longer stretches it
    p999 = collect_act_scales(spec, params, x, percentile=99.9)
    assert set(p999) == set(base)
    assert all(p999[k] <= base[k] * (1 + 1e-6) for k in base)
    x_outlier = x.copy()
    x_outlier[0, 0, 0, 0] = 50.0  # one absurd pixel
    base_o = collect_act_scales(spec, params, x_outlier)
    p999_o = collect_act_scales(spec, params, x_outlier, percentile=99.9)
    assert base_o[0] > 10 * base[0]       # max calibration blows up
    assert p999_o[0] < 2 * p999[0]        # percentile calibration shrugs
    with pytest.raises(ValueError, match="percentile"):
        collect_act_scales(spec, params, x, percentile=0.0)


def test_percentile_bisection_tracks_exact(tiny):
    """The reduction-bisection percentile estimator (the p7 compile-crash
    fix — sorts crashed the remote compiler in perf/harvest_p7fix_r4.jsonl
    and histogram scatter-adds crashed it in perf/harvest_p7iso_r4.jsonl;
    only pure reductions compile at that scale) stays conservative and
    within its documented 2^(OCT/2^ITERS) ≈ 0.02% multiplicative bound of
    the exact order statistic, whole-tensor AND per-channel, with and
    without an outlier."""
    from pytorch_yolo_tpu.models.darknet import build_forward
    from pytorch_yolo_tpu.ops.quant import (_PCT_ITERS, _PCT_OCTAVES,
                                            _collect_percentile_stats)

    spec, params = tiny
    rng = np.random.default_rng(7)
    x = rng.random((2, 96, 96, 3)).astype(np.float32)
    x_out = x.copy()
    x_out[0, 0, 0, 0] = 50.0  # range-stretching outlier
    q = 99.9
    frac = q / 100.0
    # one bisection-resolution step, multiplicative
    tol = 2.0 ** (_PCT_OCTAVES / 2.0 ** _PCT_ITERS)
    for xs in (x, x_out):
        # raw conv inputs via the eager hook = the exact reference data
        fwd = build_forward(
            spec, collect_conv_in_stats=lambda i, t: jnp.abs(t))
        _, raw = fwd(params, jnp.asarray(xs))
        est = _collect_percentile_stats(spec, params, xs, q,
                                        per_channel=True)
        for idx, a in raw.items():
            a = np.asarray(a)
            got_w = float(np.asarray(est[idx][0]))
            # guarantee 1: at least q% of values are covered (conservative)
            assert np.mean(a <= got_w) >= frac - 1e-7, (idx, got_w)
            # guarantee 2: one bin lower would NOT cover q% — the estimate
            # exceeds the exact order statistic by less than one bin width
            assert (np.mean(a < got_w / tol * (1 - 1e-6))
                    <= frac + 1.0 / a.size), (idx, got_w)
            ac = a.reshape(-1, a.shape[-1])
            got_c = np.asarray(est[idx][1])
            assert np.all(np.mean(ac <= got_c, axis=0) >= frac - 1e-7)
            assert np.all(np.mean(ac < got_c / tol * (1 - 1e-6), axis=0)
                          <= frac + 1.0 / ac.shape[0])


def test_calibration_set_size_robustness(tiny):
    """Static scales from 2 vs 6 calibration images give closely-agreeing
    detections (drift sensitivity to calibration-set size, CPU backend)."""
    spec, params = tiny
    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, (160, 200, 3), dtype=np.uint8)
            for _ in range(6)]
    det_small = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs[:2],
                             quant_calib_percentile=99.9)
    det_big = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                           quant_calib_percentile=99.9)
    probe = rng.integers(0, 256, (160, 200, 3), dtype=np.uint8)
    a = det_small.detect(probe, size=320, conf=0.3)
    b = det_big.detect(probe, size=320, conf=0.3)
    assert abs(len(a) - len(b)) <= max(3, len(a) // 4)


def test_quant_calib_size_matches_serving(tiny):
    """Calibration must be able to run at the SERVED size (r5 hardware
    finding: p6 calibrated at its native 1280 but served at 640 measured
    0.11 set agreement where dynamic scales held 0.66 — activation maxima
    scale with spatial extent).  quant_calib_size overrides the cfg [net]
    default; the state stamps the size; invalid sizes are rejected."""
    spec, params = tiny
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (160, 200, 3), dtype=np.uint8)
            for _ in range(2)]
    det_net = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                           quant_recipe="none")
    det_320 = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                           quant_calib_size=320, quant_recipe="none")
    # default stamps the cfg [net] size; override stamps the served size
    assert det_net.quant_state()["calib_size"] == [spec.net.height,
                                                   spec.net.width]
    assert det_320.quant_state()["calib_size"] == [320, 320]
    # different spatial extent -> different activation maxima somewhere
    a, b = det_net.act_scales(), det_320.act_scales()
    assert a.keys() == b.keys()
    assert any(not np.allclose(np.asarray(a[i], dtype=object).tolist(),
                               np.asarray(b[i], dtype=object).tolist())
               for i in a)
    # rectangular pair accepted; non-%32 rejected
    det_rect = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                            quant_calib_size=(320, 416), quant_recipe="none")
    assert det_rect.quant_state()["calib_size"] == [320, 416]
    with pytest.raises(ValueError, match="multiple of"):
        pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                     quant_calib_size=300, quant_recipe="none")


def test_collect_stats_and_stop_at_mutually_exclusive(tiny):
    spec, _ = tiny
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_forward(spec, stop_at=3,
                      collect_conv_in_stats=lambda i, t: jnp.max(jnp.abs(t)))


# ---------------------------------------------------------------------------
# int8-resident chains (static int8 keeps activations int8 between MXU ops)
# ---------------------------------------------------------------------------


def _static_quantized(spec, params, seed=5):
    from pytorch_yolo_tpu.ops.quant import collect_act_scales

    x = np.random.default_rng(seed).random((1, 96, 96, 3)).astype(np.float32)
    scales = collect_act_scales(spec, params, x)
    return quantize_params(spec, params, act_scales=scales)


def test_int8_resident_chain_map(tiny):
    from pytorch_yolo_tpu.config import MaxPoolSpec
    from pytorch_yolo_tpu.models.darknet import _needed_outputs
    from pytorch_yolo_tpu.ops.quant import int8_resident_chains

    spec, params = tiny
    qp = _static_quantized(spec, params)
    chains = int8_resident_chains(spec, qp)
    assert chains, "tiny's conv->maxpool->conv ladder must admit chains"
    needed = _needed_outputs(spec)
    spans_pool = False
    for j, k in chains.items():
        assert "wq" in qp[j] and "wq" in qp[k] and "sa" in qp[k]
        assert j not in needed
        between = spec.layers[j + 1:k]
        assert all(isinstance(l, MaxPoolSpec) or type(l).__name__ ==
                   "UpsampleSpec" for l in between)
        spans_pool = spans_pool or any(
            isinstance(l, MaxPoolSpec) for l in between)
    assert spans_pool  # the tiny family's signature link
    # dynamic quantization (no "sa") admits no chains
    assert int8_resident_chains(spec, quantize_params(
        spec, params, skip_layers=())) == {}


def test_int8_resident_chains_yolov3():
    """Darknet-53's 1x1->3x3 residual halves chain (the flagship's case)."""
    from pytorch_yolo_tpu.ops.quant import int8_resident_chains

    spec = model_spec("yolov3")
    params = fold_batchnorm(spec, random_raw_params(spec, seed=0))
    qp = _static_quantized(spec, params)
    chains = int8_resident_chains(spec, qp)
    # every residual block's 1x1 conv feeds its 3x3 partner directly
    assert len(chains) >= 23
    assert all(k == j + 1 for j, k in chains.items()
               if isinstance(spec.layers[j + 1], ConvSpec))


def test_int8_resident_matches_nonresident(tiny, monkeypatch):
    """The resident path (int8 handoff between convs) tracks the fp32-glue
    static-int8 path: requantization before vs after leaky differs only by
    fp reassociation, i.e. at most one int8 step per link."""
    spec, params = tiny
    qp = _static_quantized(spec, params)
    jqp = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
           for k, v in qp.items()}
    x = jnp.asarray(
        np.random.default_rng(6).random((1, 160, 160, 3), np.float32))
    monkeypatch.setenv("PYTORCH_YOLO_NO_INT8_RESIDENT", "1")
    heads_glue = build_forward(spec, quant="w8a8")(jqp, x)
    monkeypatch.delenv("PYTORCH_YOLO_NO_INT8_RESIDENT")
    heads_res = build_forward(spec, quant="w8a8")(jqp, x)
    for g, r in zip(heads_glue, heads_res):
        g, r = np.asarray(g), np.asarray(r)
        rel = np.abs(g - r) / (np.abs(g) + 1.0)
        assert rel.mean() < 5e-3, rel.mean()
        assert np.quantile(rel, 0.99) < 5e-2


def test_int8_maxpool_commutes_with_quantization():
    """max over int8 == quantize(max over fp): the property that lets
    conv->maxpool->conv ladders stay int8 through the pool."""
    from pytorch_yolo_tpu.config import MaxPoolSpec
    from pytorch_yolo_tpu.models.darknet import _maxpool

    rng = np.random.default_rng(7)
    xf = rng.normal(scale=3.0, size=(2, 13, 13, 8)).astype(np.float32)
    s = np.float32(0.123)
    xq = np.clip(np.round(xf / s), -127, 127).astype(np.int8)
    for size, stride in ((2, 2), (2, 1), (3, 1)):
        mp = MaxPoolSpec(index=0, size=size, stride=stride)
        got = np.asarray(_maxpool(jnp.asarray(xq), mp))
        assert got.dtype == np.int8
        want = np.clip(np.round(np.asarray(
            _maxpool(jnp.asarray(xf), mp)) / s), -127, 127).astype(np.int8)
        np.testing.assert_array_equal(got, want)


def test_detector_static_int8_resident_end_to_end(tiny, monkeypatch):
    """Full Detector pipeline: resident vs kill-switch detections agree."""
    spec, params = tiny
    rng = np.random.default_rng(8)
    imgs = [rng.integers(0, 256, (200, 260, 3), dtype=np.uint8)
            for _ in range(2)]
    monkeypatch.setenv("PYTORCH_YOLO_NO_INT8_RESIDENT", "1")
    det_glue = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs)
    a = det_glue.detect(imgs[0], size=320, conf=0.3)
    monkeypatch.delenv("PYTORCH_YOLO_NO_INT8_RESIDENT")
    det_res = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs)
    b = det_res.detect(imgs[0], size=320, conf=0.3)
    assert abs(len(a) - len(b)) <= max(3, len(a) // 4)
    if len(a) and len(b):
        d = np.abs(b.boxes[:, None, :] - a.boxes[None, :, :]).max(-1).min(1)
        assert (d < 8.0).mean() > 0.8


# ---- early-layer skip (round 3: large-spatial convs stay fp) -------------


def test_conv_input_strides_yolov3():
    from pytorch_yolo_tpu.ops.quant import conv_input_strides

    spec = model_spec("yolov3")
    strides = conv_input_strides(spec)
    assert strides[0] == 1            # stem conv on the raw input
    assert strides[1] == 1            # 208-sq downsample conv reads stride-1
    assert strides[12] == 4           # 104->52 downsample reads stride-4
    # the three head convs read stride 32 / 16 / 8 (fpn top-down order)
    from pytorch_yolo_tpu.ops.quant import head_conv_indices
    head_strides = sorted(strides[i] for i in head_conv_indices(spec))
    assert head_strides == [8, 16, 32]


def test_early_conv_indices_families():
    from pytorch_yolo_tpu.ops.quant import conv_input_strides, early_conv_indices

    for name in ("yolov3", "yolov3-tiny", "yolov2"):
        spec = model_spec(name)
        early = early_conv_indices(spec, min_stride=8)
        strides = conv_input_strides(spec)
        assert early == frozenset(i for i, s in strides.items() if s < 8)
        assert early, name  # every family has a large-spatial prefix


def test_early_skip_profitable_splits_zoo_on_early_pools():
    """The early-skip default predicate must reproduce the measured A/B
    split exactly: conv-chain families (any activation) win the skip,
    early conv->maxpool->conv ladders lose it (perf/int8_serving_ab_r3,
    perf/large_r3 steps 12-13).  SPP pools (deep, stride>=32) must NOT
    disqualify a model."""
    from pytorch_yolo_tpu.ops.quant import early_skip_profitable

    profitable = ("yolov3", "yolov3-spp", "yolov4", "yolov4-csp",
                  "yolov4x-mish", "yolov4-p5", "yolov4-p6", "yolov4-p7")
    ladders = ("yolov3-tiny", "yolov2", "yolov2-tiny", "yolov4-tiny")
    for name in profitable:
        assert early_skip_profitable(model_spec(name)), name
    for name in ladders:
        assert not early_skip_profitable(model_spec(name)), name


def test_default_early_min_stride_policy():
    """The per-topology threshold must reproduce the measured zoo verdicts
    (perf/gaps_r3.jsonl: at served 640/es8 x-mish WINS +3.3% and p6 ties
    while p7 loses 9.5%; perf/p7_es_ab_r3.jsonl: p7 es32 recovers 139->152;
    perf/harvest_r4.jsonl steps 9-12: p6 es16 beats es8 in both sessions):
    stride-8 skip for every early-skip-profitable family EXCEPT the deep
    ladders — stride-64 class gets 16, stride-128 class 32; ladder
    families 0."""
    from pytorch_yolo_tpu.ops.quant import default_early_min_stride

    expect = {"yolov3": 8, "yolov3-spp": 8, "yolov4": 8, "yolov4-csp": 8,
              "yolov4x-mish": 8, "yolov4-p5": 8, "yolov4-p6": 16,
              "yolov4-p7": 32,
              "yolov3-tiny": 0, "yolov2": 0, "yolov2-tiny": 0,
              "yolov4-tiny": 0}
    for name, want in expect.items():
        assert default_early_min_stride(model_spec(name)) == want, name


def test_resolve_skip_layers_env(monkeypatch):
    from pytorch_yolo_tpu.ops.quant import (early_conv_indices,
                                            head_conv_indices,
                                            resolve_skip_layers)

    spec = model_spec("yolov3")
    monkeypatch.delenv("PYTORCH_YOLO_INT8_EARLY_STRIDE", raising=False)
    # env unset: the caller-supplied default decides
    assert resolve_skip_layers(spec) == head_conv_indices(spec)
    assert resolve_skip_layers(spec, default_min_stride=8) == (
        head_conv_indices(spec) | early_conv_indices(spec, 8))
    monkeypatch.setenv("PYTORCH_YOLO_INT8_EARLY_STRIDE", "0")
    assert resolve_skip_layers(
        spec, default_min_stride=8) == head_conv_indices(spec)
    monkeypatch.setenv("PYTORCH_YOLO_INT8_EARLY_STRIDE", "4")
    assert resolve_skip_layers(spec) == (head_conv_indices(spec)
                                         | early_conv_indices(spec, 4))
    # explicit container unions with the early skip too
    assert resolve_skip_layers(spec, frozenset({50}),
                               early_min_stride=8) == (
        frozenset({50}) | early_conv_indices(spec, 8))


def test_detector_early_skip_policy(tiny, monkeypatch):
    """Early skip engages ONLY for early-pool-free models with
    reduced-precision glue (measured A/Bs: perf/int8_serving_ab_r3.jsonl
    for yolov3, perf/large_r3.jsonl steps 12-13 for the mish families);
    early-ladder families and fp32 glue keep quantize-everything-but-heads.
    Env forces both ways."""
    from pytorch_yolo_tpu.ops.quant import early_conv_indices

    spec, params = tiny  # conv_pool family
    early = early_conv_indices(spec, 8)
    monkeypatch.delenv("PYTORCH_YOLO_INT8_EARLY_STRIDE", raising=False)
    det = pyt.Detector(spec, params, quant="w8a8")
    assert all("wq" in det.params[i] for i in early)  # ladders stay resident
    det_b = pyt.Detector(spec, params, quant="w8a8",
                         compute_dtype=jnp.bfloat16, precision="default")
    assert all("wq" in det_b.params[i] for i in early)  # conv_pool: still all
    monkeypatch.setenv("PYTORCH_YOLO_INT8_EARLY_STRIDE", "8")
    det_env = pyt.Detector(spec, params, quant="w8a8")
    assert all("wq" not in det_env.params[i] and "w" in det_env.params[i]
               for i in early)

    monkeypatch.delenv("PYTORCH_YOLO_INT8_EARLY_STRIDE", raising=False)
    v3 = model_spec("yolov3")  # conv_conv flagship
    v3p = fold_batchnorm(v3, random_raw_params(v3, seed=4))
    v3_early = early_conv_indices(v3, 8)
    det_v3_fp = pyt.Detector(v3, v3p, quant="w8a8")
    assert all("wq" in det_v3_fp.params[i] for i in v3_early)  # fp32 glue
    assert not det_v3_fp.stem_s2d
    det_v3_b = pyt.Detector(v3, v3p, quant="w8a8",
                            compute_dtype=jnp.bfloat16, precision="default")
    assert all("wq" not in det_v3_b.params[i] for i in v3_early)
    assert det_v3_b.stem_s2d  # fp stem + conv_conv: s2d composes
    monkeypatch.setenv("PYTORCH_YOLO_INT8_EARLY_STRIDE", "0")
    det_v3_b0 = pyt.Detector(v3, v3p, quant="w8a8",
                             compute_dtype=jnp.bfloat16, precision="default")
    assert all("wq" in det_v3_b0.params[i] for i in v3_early)
    assert not det_v3_b0.stem_s2d  # quantized stem: nothing to pack

    # mish conv-chain family (yolov4-csp): the skip engages with bf16 glue
    # too (perf/large_r3.jsonl step 13 flipped csp int8 from -7% to ~+3%
    # vs bf16); fp32 glue still quantizes everything-but-heads.
    monkeypatch.delenv("PYTORCH_YOLO_INT8_EARLY_STRIDE", raising=False)
    csp = model_spec("yolov4-csp")
    cspp = fold_batchnorm(csp, random_raw_params(csp, seed=5))
    csp_early = early_conv_indices(csp, 8)
    det_csp_b = pyt.Detector(csp, cspp, quant="w8a8",
                             compute_dtype=jnp.bfloat16, precision="default")
    assert all("wq" not in det_csp_b.params[i] and "w" in det_csp_b.params[i]
               for i in csp_early)
    det_csp_fp = pyt.Detector(csp, cspp, quant="w8a8")
    assert all("wq" in det_csp_fp.params[i] for i in csp_early)


def test_detector_int8_stem_s2d_parity(monkeypatch):
    """int8+bf16-glue with s2d stem (the measured-fastest yolov3 serving
    mode) tracks the same quantization with the natural stem."""
    spec = model_spec("yolov3")
    params = fold_batchnorm(spec, random_raw_params(spec, seed=11))
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (200, 260, 3), dtype=np.uint8)
            for _ in range(2)]
    monkeypatch.delenv("PYTORCH_YOLO_INT8_EARLY_STRIDE", raising=False)
    det_s2d = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                           compute_dtype=jnp.bfloat16, precision="default")
    assert det_s2d.stem_s2d
    det_nat = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                           compute_dtype=jnp.bfloat16, precision="default",
                           stem_s2d=False)
    a = det_s2d.detect(imgs[0], size=160, conf=0.3)
    b = det_nat.detect(imgs[0], size=160, conf=0.3)
    assert abs(len(a) - len(b)) <= max(2, len(b) // 10)
    if len(a) and len(b):
        d = np.abs(a.boxes[:, None, :] - b.boxes[None, :, :]).max(-1).min(1)
        assert (d < 4.0).mean() > 0.9


def test_quantized_conv_mish_epilogue():
    """mish does NOT commute with positive scales (unlike leaky/relu), so the
    int8-resident epilogue must activate at the true fp scale and requantize
    after.  Check both epilogue variants against an explicit fp reference."""
    from pytorch_yolo_tpu.models.darknet import apply_activation

    rng = np.random.default_rng(31)
    spec = ConvSpec(index=0, in_channels=8, filters=16, size=3, stride=1,
                    pad=1, batch_normalize=True, activation="mish")
    w = rng.normal(0, 0.3, (3, 3, 8, 16)).astype(np.float32)
    b = rng.normal(0, 0.1, (16,)).astype(np.float32)
    qp = quantize_params(spec_from_single(spec), {0: {"w": w, "b": b}})[0]
    x = rng.normal(0, 1.5, (2, 9, 9, 8)).astype(np.float32)
    sx = jnp.float32(np.abs(x).max() / 127.0)
    xq = jnp.clip(jnp.round(jnp.asarray(x) / sx), -127, 127).astype(jnp.int8)

    # fp-out variant: int32 acc -> rescale+bias -> mish
    got_fp = np.asarray(quantized_conv(
        xq, jnp.asarray(qp["wq"]), jnp.asarray(qp["ws"]), jnp.asarray(b),
        spec, sx=sx))
    import jax.lax as lax
    deq = np.asarray(xq, np.float32) * float(sx)
    ref = lax.conv_general_dilated(
        jnp.asarray(deq), jnp.asarray(qp["wq"], jnp.float32)
        * jnp.asarray(qp["ws"]), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(apply_activation(ref + b, "mish"))
    np.testing.assert_allclose(got_fp, ref, rtol=1e-4, atol=1e-4)

    # int8-resident variant: requantize AFTER mish (epilogue order matters —
    # dividing before mish would change the value, unlike leaky)
    out_scale = jnp.float32(np.abs(ref).max() / 127.0)
    got_q = np.asarray(quantized_conv(
        xq, jnp.asarray(qp["wq"]), jnp.asarray(qp["ws"]), jnp.asarray(b),
        spec, sx=sx, out_scale=out_scale))
    want_q = np.clip(np.round(ref / float(out_scale)), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(got_q, want_q)


def spec_from_single(conv: ConvSpec):
    """Minimal ModelSpec-shaped stand-in for quantize_params (needs .layers
    and head/skip queries keyed by index)."""
    from pytorch_yolo_tpu.config import ModelSpec, NetInfo

    return ModelSpec(net=NetInfo(width=32, height=32),
                     layers=(conv,), out_channels=(conv.filters,))


def test_persisted_act_scales_round_trip(tiny):
    """act_scales() -> Detector(quant_act_scales=...) reproduces the
    calibrated detector bit-for-bit without re-running the calibration
    forward (calibrate once, serve many)."""
    spec, params = tiny
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (200, 260, 3), dtype=np.uint8)
            for _ in range(2)]
    # quant_recipe="none": this test covers the LEGACY flat-scales path —
    # a bare {idx: scale} dict can only revive a plain calibration (the
    # recipe's smooth grids / bias deltas travel via quant_state()).
    calibrated = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                              quant_recipe="none")
    scales = calibrated.act_scales()
    assert scales and all(v > 0 for v in scales.values())

    # JSON round-trip (string keys) — exactly what the CLI persists
    import json

    revived = json.loads(json.dumps(scales))
    reloaded = pyt.Detector(spec, params, quant="w8a8",
                            quant_act_scales=revived)
    a = calibrated.detect(imgs[0], size=320, conf=0.3)
    b = reloaded.detect(imgs[0], size=320, conf=0.3)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.boxes, b.boxes)
    np.testing.assert_array_equal(a.cls_id, b.cls_id)


def test_act_scales_and_calib_are_mutually_exclusive(tiny):
    spec, params = tiny
    img = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="not both"):
        pyt.Detector(spec, params, quant="w8a8", quant_calib=[img],
                     quant_act_scales={0: 1.0})


def test_partial_act_scales_warn_and_fall_back_dynamic(tiny):
    """Scales persisted under a different skip policy leave uncovered
    quantized convs dynamic — loudly, not silently."""
    import warnings

    spec, params = tiny
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        det = pyt.Detector(spec, params, quant="w8a8",
                           quant_act_scales={0: 0.02})
    assert any("fall back to dynamic" in str(x.message) for x in w)
    assert "sa" in det.params[0]
    # still serves
    img = np.zeros((64, 64, 3), np.uint8)
    det.detect(img, size=320, conf=0.5)


def test_rank_quant_noise_properties(tiny):
    """rank_quant_noise covers exactly the quantized convs, is sorted
    descending, and every isolated error is small-but-nonzero (int8 noise,
    not upstream accumulation)."""
    from pytorch_yolo_tpu.ops.quant import (collect_act_scales,
                                            rank_quant_noise)

    spec, params = tiny
    rng = np.random.default_rng(11)
    x = rng.random((1, spec.net.height, spec.net.width, 3)).astype(np.float32)
    scales = collect_act_scales(spec, params, x)
    qp = quantize_params(spec, params, act_scales=scales)  # skip heads
    ranked = rank_quant_noise(spec, params, qp, x)
    quantized = {i for i, p in qp.items() if "wq" in p}
    assert {i for i, _ in ranked} == quantized
    errs = [e for _, e in ranked]
    assert errs == sorted(errs, reverse=True)
    assert all(0 < e < 0.2 for e in errs)  # isolated 8-bit noise scale


def test_detector_quant_skip_noisy(tiny):
    """quant_skip_noisy=K keeps the K noisiest convs fp (they retain "w"),
    and the quant_state() round trip reproduces the partition exactly."""
    import json

    spec, params = tiny
    rng = np.random.default_rng(12)
    imgs = [rng.integers(0, 256, (200, 260, 3), dtype=np.uint8)
            for _ in range(2)]
    base = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs)
    det = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                       quant_skip_noisy=3)
    extra = det._quant_skip - base._quant_skip
    assert len(extra) == 3
    for i in extra:
        assert "w" in det.params[i] and "wq" not in det.params[i]
        assert "wq" in base.params[i]  # was quantized under the base policy

    # quant_state round trip: scales + skip reproduce identical detections
    state = json.loads(json.dumps(det.quant_state()))
    assert sorted(state["skip"]) == sorted(int(i) for i in det._quant_skip)
    revived = pyt.Detector(spec, params, quant="w8a8",
                           quant_act_scales=state["scales"],
                           quant_skip_layers=frozenset(state["skip"]))
    assert revived._quant_skip >= frozenset(state["skip"])
    a = det.detect(imgs[0], size=320, conf=0.3)
    b = revived.detect(imgs[0], size=320, conf=0.3)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.boxes, b.boxes)


def test_quant_skip_noisy_requires_calib(tiny):
    spec, params = tiny
    with pytest.raises(ValueError, match="quant_skip_noisy requires"):
        pyt.Detector(spec, params, quant="w8a8", quant_skip_noisy=2,
                     quant_act_scales={0: 0.02})


def test_concat_split_groups_families():
    """Split map = convs fed by multi-source route concats, with the
    per-source channel widths (yolov3: exactly the two measured-worst int8
    convs, perf/int8_attrib_cpu_r3.jsonl)."""
    from pytorch_yolo_tpu.models.zoo import model_spec
    from pytorch_yolo_tpu.ops.quant import concat_split_groups

    assert concat_split_groups(model_spec("yolov3")) == {
        87: (256, 512), 99: (128, 256)}
    assert concat_split_groups(model_spec("yolov3-tiny")) == {21: (128, 256)}
    # SPP's 4-way maxpool concat qualifies too (yolov4 conv 114)
    v4 = concat_split_groups(model_spec("yolov4"))
    assert v4[114] == (512, 512, 512, 512)


def test_split_concat_conv_exactness(tiny):
    """The split path is the plain quantized conv when every branch uses
    the same scale, and strictly more accurate when branch magnitudes are
    bimodal and scales are calibrated per branch."""
    from pytorch_yolo_tpu.ops.quant import quantize_params, quantized_conv
    from pytorch_yolo_tpu.models.darknet import _conv

    spec, params = tiny
    idx, splits = 21, (128, 256)
    layer = spec.layers[idx]
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 10, 10, 384)).astype(np.float32)
    x[..., :128] *= 20.0  # bimodal: branch A 20x louder than branch B

    qp = quantize_params(spec, params, skip_layers=())[idx]
    sx = jnp.float32(np.abs(x).max() / 127.0)
    y_scalar = quantized_conv(jnp.asarray(x), qp["wq"], qp["ws"], qp["b"],
                              layer, sx=sx)
    # same scale in both groups == the scalar path (up to f32 reassociation
    # of the two partial accumulators)
    y_same = quantized_conv(jnp.asarray(x), qp["wq"], qp["ws"], qp["b"],
                            layer, sxg=jnp.asarray([sx, sx]), splits=splits)
    np.testing.assert_allclose(np.asarray(y_same), np.asarray(y_scalar),
                               rtol=2e-6, atol=1e-4)

    # per-branch scales: quieter branch gets a finer grid -> lower error
    sxg = jnp.asarray([np.abs(x[..., :128]).max() / 127.0,
                       np.abs(x[..., 128:]).max() / 127.0], jnp.float32)
    y_split = quantized_conv(jnp.asarray(x), qp["wq"], qp["ws"], qp["b"],
                             layer, sxg=sxg, splits=splits)
    y_fp = _conv(jnp.asarray(x), jnp.asarray(params[idx]["w"]),
                 jnp.asarray(params[idx]["b"]), layer, jnp.float32,
                 jax.lax.Precision.HIGHEST)
    err_scalar = float(jnp.linalg.norm(y_scalar - y_fp))
    err_split = float(jnp.linalg.norm(y_split - y_fp))
    # The loud branch's own quantization noise is the error floor of BOTH
    # paths (its scale is its own max either way); the split removes the
    # quiet branch's coarse-grid error on top of that floor (measured here:
    # ~30 -> ~21, i.e. the quiet branch's error term essentially vanishes).
    assert err_split < 0.8 * err_scalar, (err_split, err_scalar)

    with pytest.raises(ValueError, match="do not cover"):
        quantized_conv(jnp.asarray(x), qp["wq"], qp["ws"], qp["b"], layer,
                       sxg=sxg, splits=(128, 128))


def test_detector_split_concat_end_to_end(tiny):
    """quant_split_concat=True calibrates per-branch scales for the concat
    conv, serves, and the persisted quant_state (list-valued scales)
    round-trips bit-identically."""
    import json

    spec, params = tiny
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (200, 260, 3), dtype=np.uint8)
            for _ in range(2)]
    det = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                       quant_split_concat=True)
    assert "sag" in det.params[21] and "sa" not in det.params[21]
    assert det.params[21]["sag"].shape == (2,)

    state = json.loads(json.dumps(det.quant_state()))
    assert isinstance(state["scales"]["21"], list)
    revived = pyt.Detector(spec, params, quant="w8a8",
                           quant_act_scales=state["scales"],
                           quant_skip_layers=frozenset(state["skip"]))
    a = det.detect(imgs[0], size=320, conf=0.3)
    b = revived.detect(imgs[0], size=320, conf=0.3)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.boxes, b.boxes)
    np.testing.assert_array_equal(a.cls_id, b.cls_id)


def test_split_concat_requires_calib(tiny):
    spec, params = tiny
    with pytest.raises(ValueError, match="quant_split_concat requires"):
        pyt.Detector(spec, params, quant="w8a8", quant_split_concat=True)


def test_smooth_scales_single_conv_numerics(tiny):
    """Per-channel smoothed grid (SmoothQuant-style): with per-channel
    bimodal input magnitudes the smoothed conv beats the scalar-scale conv
    against fp32; with a constant grid it reproduces the scalar path."""
    from pytorch_yolo_tpu.models.darknet import _conv
    from pytorch_yolo_tpu.ops.quant import quantize_params, quantized_conv

    spec, params = tiny
    idx = 4  # plain 3x3 conv, 32 input channels (tiny: conv/pool alternate)
    layer = spec.layers[idx]
    cin = params[idx]["w"].shape[2]
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 12, 12, cin)).astype(np.float32)
    x[..., : cin // 2] *= 25.0  # half the channels 25x louder

    a_c = np.abs(x).max(axis=(0, 1, 2))
    w_c = np.abs(params[idx]["w"]).max(axis=(0, 1, 3))
    s_c = np.sqrt(a_c / np.maximum(w_c, 1e-12))
    sx = float((a_c / s_c).max()) / 127.0
    vec = (s_c * sx).astype(np.float32)

    qs = quantize_params(spec, params, skip_layers=(),
                         act_scales={idx: float(a_c.max() / 127.0)})[idx]
    qv = quantize_params(spec, params, skip_layers=(),
                         act_scales={idx: vec})[idx]
    assert np.asarray(qv["sa"]).shape == (cin,)
    # smoothing folds the grid into the kernels -> different wq than scalar
    assert not np.array_equal(np.asarray(qv["wq"]), np.asarray(qs["wq"]))

    y_fp = _conv(jnp.asarray(x), jnp.asarray(params[idx]["w"]),
                 jnp.asarray(params[idx]["b"]), layer, jnp.float32,
                 jax.lax.Precision.HIGHEST)
    y_s = quantized_conv(jnp.asarray(x), qs["wq"], qs["ws"], qs["b"],
                         layer, sx=qs["sa"])
    y_v = quantized_conv(jnp.asarray(x), qv["wq"], qv["ws"], qv["b"],
                         layer, sx=qv["sa"])
    err_s = float(jnp.linalg.norm(y_s - y_fp))
    err_v = float(jnp.linalg.norm(y_v - y_fp))
    assert err_v < err_s, (err_v, err_s)

    # constant grid == the scalar path (up to weight-rescale rounding)
    const = np.full(cin, float(qs["sa"]), np.float32)
    qc = quantize_params(spec, params, skip_layers=(),
                         act_scales={idx: const})[idx]
    y_c = quantized_conv(jnp.asarray(x), qc["wq"], qc["ws"], qc["b"],
                         layer, sx=qc["sa"])
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_s),
                               rtol=1e-3, atol=5e-2)


def test_detector_smooth_end_to_end(tiny):
    """quant_smooth calibrates per-channel grids for every quantized conv
    (resident chains included) and the persisted quant_state round-trips
    bit-identically."""
    import json

    spec, params = tiny
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (200, 260, 3), dtype=np.uint8)
            for _ in range(2)]
    det = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                       quant_smooth=0.5)
    vecs = [p["sa"] for p in det.params.values()
            if "sa" in p and np.asarray(p["sa"]).ndim == 1]
    assert vecs and all(np.asarray(v).min() > 0 for v in vecs)

    state = json.loads(json.dumps(det.quant_state()))
    some = next(v for v in state["scales"].values() if isinstance(v, dict))
    assert "per_channel" in some
    revived = pyt.Detector(spec, params, quant="w8a8",
                           quant_act_scales=state["scales"],
                           quant_skip_layers=frozenset(state["skip"]))
    a = det.detect(imgs[0], size=320, conf=0.3)
    b = revived.detect(imgs[0], size=320, conf=0.3)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.boxes, b.boxes)


def test_smooth_validation(tiny):
    spec, params = tiny
    img = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="quant_smooth requires"):
        pyt.Detector(spec, params, quant="w8a8", quant_smooth=0.5)
    with pytest.raises(ValueError, match="mutually exclusive"):
        pyt.Detector(spec, params, quant="w8a8", quant_calib=[img],
                     quant_smooth=0.5, quant_split_concat=True)
    with pytest.raises(ValueError, match="must be in"):
        pyt.Detector(spec, params, quant="w8a8", quant_calib=[img],
                     quant_smooth=1.5)


def test_smooth_composes_with_skip_noisy(tiny):
    """quant_smooth + quant_skip_noisy: ranking runs under the smoothed
    policy (vector `sa` flows through rank_quant_noise), the K noisiest
    convs stay fp, and the persisted state revives identically."""
    import json

    spec, params = tiny
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (160, 200, 3), dtype=np.uint8)
            for _ in range(2)]
    det = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                       quant_smooth=0.5, quant_skip_noisy=2)
    n_fp_body = sum(1 for p in det.params.values() if "w" in p)
    det_base = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                            quant_smooth=0.5)
    n_fp_base = sum(1 for p in det_base.params.values() if "w" in p)
    assert n_fp_body == n_fp_base + 2  # exactly K extra convs kept fp
    state = json.loads(json.dumps(det.quant_state()))
    revived = pyt.Detector(spec, params, quant="w8a8",
                           quant_act_scales=state["scales"],
                           quant_skip_layers=frozenset(state["skip"]))
    a = det.detect(imgs[0], size=320, conf=0.3)
    b = revived.detect(imgs[0], size=320, conf=0.3)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.boxes, b.boxes)


def test_bias_correction_reduces_mean_error(tiny):
    """bias_correct_params: the per-channel mean pre-activation error of
    every corrected conv drops to ~0 on the calibration input (exact for
    the conv itself), and the deltas it returns reproduce the corrected
    pytree via apply_bias_deltas."""
    import jax as _jax

    from pytorch_yolo_tpu.models.darknet import build_forward
    from pytorch_yolo_tpu.ops.quant import (apply_bias_deltas,
                                            bias_correct_params,
                                            collect_act_scales,
                                            quantize_params)

    spec, params = tiny
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, spec.net.height, spec.net.width, 3)) \
        .astype(np.float32)
    scales = collect_act_scales(spec, params, x)
    q = quantize_params(spec, params, skip_layers=(), act_scales=scales)
    qc, deltas = bias_correct_params(spec, params, q, x)
    assert deltas and all(np.isfinite(d).all() for d in deltas.values())

    # residual mean error after correction ~ 0 per channel (same input)
    import dataclasses as _dc

    from pytorch_yolo_tpu.config import ConvSpec
    from pytorch_yolo_tpu.models.darknet import _conv
    from pytorch_yolo_tpu.ops.quant import quantized_conv

    fwd = _jax.jit(build_forward(spec, collect_conv_in_stats=lambda i, t: t))
    _, stats = fwd(params, jnp.asarray(x))
    layer = next(l for l in spec.layers
                 if isinstance(l, ConvSpec) and l.index in deltas)
    lin = _dc.replace(layer, activation="linear")
    xin = stats[layer.index]
    y_fp = _conv(xin, jnp.asarray(params[layer.index]["w"]),
                 jnp.asarray(params[layer.index]["b"]), lin, jnp.float32,
                 jax.lax.Precision.HIGHEST)
    y_un = quantized_conv(xin, q[layer.index]["wq"], q[layer.index]["ws"],
                          q[layer.index]["b"], lin,
                          sx=q[layer.index].get("sa"))
    y_co = quantized_conv(xin, qc[layer.index]["wq"], qc[layer.index]["ws"],
                          qc[layer.index]["b"], lin,
                          sx=qc[layer.index].get("sa"))
    mean_un = np.abs(np.asarray(jnp.mean(y_fp - y_un, axis=(0, 1, 2))))
    mean_co = np.abs(np.asarray(jnp.mean(y_fp - y_co, axis=(0, 1, 2))))
    assert mean_co.max() < 1e-4  # exact on the calibration input
    assert mean_co.max() <= mean_un.max()

    q2 = apply_bias_deltas(q, deltas)
    np.testing.assert_array_equal(np.asarray(q2[layer.index]["b"]),
                                  np.asarray(qc[layer.index]["b"]))


def test_detector_bias_correct_end_to_end(tiny):
    """quant_bias_correct calibrates deltas, quant_state() persists them,
    and the revived detector (no calibration images) is bit-identical."""
    import json

    spec, params = tiny
    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (200, 260, 3), dtype=np.uint8)
            for _ in range(2)]
    det = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                       quant_smooth=0.5, quant_bias_correct=True)
    assert det._bias_deltas
    state = json.loads(json.dumps(det.quant_state()))
    assert state["bias_delta"]
    revived = pyt.Detector(spec, params, quant="w8a8",
                           quant_act_scales=state["scales"],
                           quant_skip_layers=frozenset(state["skip"]),
                           quant_bias_delta=state["bias_delta"])
    a = det.detect(imgs[0], size=320, conf=0.3)
    b = revived.detect(imgs[0], size=320, conf=0.3)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.boxes, b.boxes)
    np.testing.assert_array_equal(a.obj, b.obj)


def test_bias_correct_validation(tiny):
    spec, params = tiny
    img = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="quant_bias_correct requires"):
        pyt.Detector(spec, params, quant="w8a8", quant_bias_correct=True)
    with pytest.raises(ValueError, match="not both"):
        pyt.Detector(spec, params, quant="w8a8", quant_calib=[img],
                     quant_bias_delta={0: [0.0]})
    from pytorch_yolo_tpu.ops.quant import (apply_bias_deltas,
                                            collect_act_scales,
                                            quantize_params)
    x = np.zeros((1, spec.net.height, spec.net.width, 3), np.float32)
    q = quantize_params(spec, params, skip_layers=(),
                        act_scales=collect_act_scales(spec, params, x))
    some = next(i for i, p in q.items() if "wq" in p)
    with pytest.raises(ValueError, match="does not match"):
        apply_bias_deltas(q, {some: np.zeros(3, np.float32)})


_CONV_CONV_MINI = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=6
activation=linear

[yolo]
mask=0
anchors=10,13, 16,30
classes=1
num=2
"""


def test_quant_recipe_auto(tiny):
    """quant_recipe='auto' encodes the measured best calibration recipe in
    one place: p99.9 percentile ranging + per-channel smoothing + bias
    correction (the trio measured best on BOTH families — PERF.md r3)."""
    from pytorch_yolo_tpu.config import build_spec, parse_cfg_text
    from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params

    spec, params = tiny
    rng = np.random.default_rng(13)
    imgs = [rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
            for _ in range(2)]
    det = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                       quant_recipe="auto")
    assert any("sa" in p and np.asarray(p["sa"]).ndim == 1
               for p in det.params.values())  # smoothed grids present
    assert det._bias_deltas  # bias correction on

    cc = build_spec(parse_cfg_text(_CONV_CONV_MINI))
    ccp = fold_batchnorm(cc, random_raw_params(cc, seed=5))
    det_cc = pyt.Detector(cc, ccp, quant="w8a8", quant_calib=imgs,
                          quant_recipe="auto")
    assert det_cc._bias_deltas  # family-independent trio
    # percentile ranging engaged: recipe scales differ from max-calib ones
    det_max = pyt.Detector(cc, ccp, quant="w8a8", quant_calib=imgs,
                           quant_smooth=0.5, quant_bias_correct=True)
    k = next(i for i, p in det_cc.params.items() if "sa" in p)
    assert not np.array_equal(np.asarray(det_cc.params[k]["sa"]),
                              np.asarray(det_max.params[k]["sa"]))

    with pytest.raises(ValueError, match="chooses the int8 knobs"):
        pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                     quant_recipe="auto", quant_calib_percentile=99.0)

    with pytest.raises(ValueError, match="'auto' or 'none'"):
        pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                     quant_recipe="best")
    with pytest.raises(ValueError, match="requires quant_calib"):
        pyt.Detector(spec, params, quant="w8a8", quant_recipe="auto")
    with pytest.raises(ValueError, match="chooses the int8 knobs"):
        pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                     quant_recipe="auto", quant_smooth=0.5)


def test_quant_recipe_default_resolution(tiny):
    """Round-4 calibration default: bare quant_calib resolves to the recipe
    (TPU drift bound perf/harvest_r4.jsonl — yolov3 served agreement
    0.9425 recipe vs 0.9058 plain); explicit knobs or quant_recipe='none'
    opt out, and 'none' persists unstamped (legacy-compatible state)."""
    spec, params = tiny
    rng = np.random.default_rng(14)
    imgs = [rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
            for _ in range(2)]
    # bare calibration -> auto: smoothed grids + bias deltas + stamp
    det = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs)
    assert det._quant_recipe == "auto"
    assert det._bias_deltas
    assert det.quant_state().get("recipe") == "auto"
    # explicit opt-out: plain min/max calibration, no stamp
    plain = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                         quant_recipe="none")
    assert plain._quant_recipe is None
    assert not plain._bias_deltas
    assert "recipe" not in plain.quant_state()
    # an explicit knob implies the caller drives: no silent auto on top
    knobbed = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                           quant_calib_percentile=99.9)
    assert knobbed._quant_recipe is None
    assert not knobbed._bias_deltas
    # the auto default and the explicit recipe produce the same detector
    expl = pyt.Detector(spec, params, quant="w8a8", quant_calib=imgs,
                        quant_recipe="auto")
    k = next(i for i, p in expl.params.items() if "sa" in p)
    np.testing.assert_array_equal(np.asarray(det.params[k]["sa"]),
                                  np.asarray(expl.params[k]["sa"]))


def test_weight_only_w8_forward_close_to_fp(tiny):
    """quant='w8' (weight-only int8): per-channel weight rounding is the
    ONLY error source, so the fp32-compute w8 forward tracks the fp32
    forward to ~0.4%/conv — and no activation-quant machinery engages
    (no 'sa', no resident chains)."""
    from pytorch_yolo_tpu.models.darknet import build_forward

    spec, params = tiny
    det = pyt.Detector(spec, params, quant="w8")
    assert all("sa" not in p and "sag" not in p
               for p in det.params.values())
    assert any("wq" in p for p in det.params.values())
    # heads stay fp by default
    from pytorch_yolo_tpu.ops.quant import head_conv_indices
    assert all("w" in det.params[i] for i in head_conv_indices(spec))

    x = np.random.default_rng(2).uniform(
        0, 1, (1, spec.net.height, spec.net.width, 3)).astype(np.float32)
    fwd_fp = jax.jit(build_forward(spec))
    fwd_w8 = jax.jit(build_forward(spec, quant="w8"))
    heads_fp = fwd_fp(params, jnp.asarray(x))
    heads_w8 = fwd_w8(det.params, jnp.asarray(x))
    for a, b in zip(heads_w8, heads_fp):
        a, b = np.asarray(a), np.asarray(b)
        denom = float(np.linalg.norm(b.ravel())) or 1.0
        rel = float(np.linalg.norm((a - b).ravel())) / denom
        assert rel < 0.05, rel  # weight rounding only — small relative err

    r = det.detect(np.random.default_rng(0).integers(
        0, 256, (240, 320, 3), dtype=np.uint8), size=320, conf=0.3)
    assert np.isfinite(r.boxes).all()


def test_weight_only_w8_validation(tiny):
    spec, params = tiny
    img = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="weight-only"):
        pyt.Detector(spec, params, quant="w8", quant_calib=[img])
    with pytest.raises(ValueError, match="weight-only"):
        pyt.Detector(spec, params, quant="w8", quant_smooth=0.5)
    with pytest.raises(ValueError, match="unknown quant mode"):
        pyt.Detector(spec, params, quant="int8")
