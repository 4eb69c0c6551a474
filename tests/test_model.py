"""Forward-pass parity vs the torch oracle (SURVEY.md §4.2.1/.3).

The oracle runs NCHW/OIHW with *un-folded* BatchNorm; the framework runs
NHWC/HWIO with BN folded into the conv — agreement pins both the layout
transposes and the folding math across the whole network, including the
route/shortcut topology and the tiny maxpool stride-1 quirk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_yolo_tpu.models.darknet import build_forward, head_shapes
from pytorch_yolo_tpu.models.zoo import model_spec
from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params
from tests.oracle.torch_ref import forward_oracle, raw_to_oracle


def _run_both(name: str, size: int, seed: int = 0, batch: int = 1):
    spec = model_spec(name)
    raw = random_raw_params(spec, seed=seed)
    params = jax.tree_util.tree_map(jnp.asarray, fold_batchnorm(spec, raw))
    fwd = jax.jit(build_forward(spec))

    rng = np.random.default_rng(seed)
    x_nhwc = rng.uniform(0, 1, size=(batch, size, size, 3)).astype(np.float32)
    heads_jax = fwd(params, jnp.asarray(x_nhwc))
    heads_torch = forward_oracle(spec, raw_to_oracle(raw), x_nhwc.transpose(0, 3, 1, 2))
    return spec, heads_jax, heads_torch


@pytest.mark.parametrize("size", [416, 320])
def test_tiny_forward_parity(size):
    spec, heads_jax, heads_torch = _run_both("yolov3-tiny", size)
    assert len(heads_jax) == len(heads_torch) == 2
    for hj, ht in zip(heads_jax, heads_torch):
        ht_nhwc = ht.transpose(0, 2, 3, 1)
        assert hj.shape == ht_nhwc.shape
        np.testing.assert_allclose(np.asarray(hj), ht_nhwc, rtol=1e-4, atol=1e-4)


def test_full_forward_parity():
    spec, heads_jax, heads_torch = _run_both("yolov3", 416)
    assert len(heads_jax) == 3
    for hj, ht in zip(heads_jax, heads_torch):
        ht_nhwc = ht.transpose(0, 2, 3, 1)
        assert hj.shape == ht_nhwc.shape
        # 75 convs + 23 residual adds of fp32 accumulation with synthetic
        # (variance-unstable) weights: a handful of elements drift to ~1e-2
        # relative.  Semantic bugs (wrong layout/topology/precision) move
        # *most* elements, so require near-total agreement at tight tolerance
        # and bounded worst-case drift.
        # (measured: activations reach ~1e5 absmax with these weights; 99.9%
        # of elements agree within ~8e-4 relative, worst case ~3e-2)
        ours, theirs = np.asarray(hj), ht_nhwc
        close = np.isclose(ours, theirs, rtol=1e-3, atol=1e-3)
        assert close.mean() > 0.998, f"only {close.mean():.4%} within tight tol"
        rel = np.abs(ours - theirs) / (np.abs(theirs) + 1.0)
        assert np.quantile(rel, 0.999) < 2e-3, f"p999 rel {np.quantile(rel, 0.999):.3e}"
        assert rel.max() < 5e-2, f"worst-case rel drift {rel.max():.3e}"


def test_head_shapes():
    spec = model_spec("yolov3")
    assert head_shapes(spec, 416, batch=2) == (
        (2, 13, 13, 255), (2, 26, 26, 255), (2, 52, 52, 255))
    tiny = model_spec("yolov3-tiny")
    assert head_shapes(tiny, 416) == ((1, 13, 13, 255), (1, 26, 26, 255))


def test_maxpool_stride1_preserves_grid():
    """The tiny layer-11 maxpool(size=2, stride=1) must keep 13x13
    (SURVEY.md §7 hard parts)."""
    spec, heads_jax, _ = _run_both("yolov3-tiny", 416)
    assert heads_jax[0].shape[1:3] == (13, 13)


def test_batched_forward_matches_single():
    spec = model_spec("yolov3-tiny")
    raw = random_raw_params(spec, seed=1)
    params = jax.tree_util.tree_map(jnp.asarray, fold_batchnorm(spec, raw))
    fwd = jax.jit(build_forward(spec))
    rng = np.random.default_rng(1)
    xb = rng.uniform(0, 1, size=(3, 416, 416, 3)).astype(np.float32)
    hb = fwd(params, jnp.asarray(xb))
    for i in range(3):
        hs = fwd(params, jnp.asarray(xb[i : i + 1]))
        for b, s in zip(hb, hs):
            np.testing.assert_allclose(np.asarray(b[i]), np.asarray(s[0]), rtol=1e-5, atol=1e-5)


def test_spp_forward_parity():
    """SPP head (stride-1 k5/9/13 maxpools + 4-way concat) vs torch oracle."""
    spec, heads_jax, heads_torch = _run_both("yolov3-spp", 256)
    assert len(heads_jax) == 3
    for hj, ht in zip(heads_jax, heads_torch):
        ht_nhwc = ht.transpose(0, 2, 3, 1)
        assert hj.shape == ht_nhwc.shape
        close = np.isclose(np.asarray(hj), ht_nhwc, rtol=1e-3, atol=1e-3)
        assert close.mean() > 0.998


def test_yolov2_forward_parity():
    """YOLOv2 (Darknet-19 + reorg passthrough + region head) vs torch oracle.

    The oracle's reorg is a literal translation of Darknet's reorg_cpu index
    loop, so agreement here pins the framework's reshape/transpose-algebra
    _reorg to the real Darknet channel shuffle."""
    spec, heads_jax, heads_torch = _run_both("yolov2", 416)
    assert len(heads_jax) == 1
    hj, ht = np.asarray(heads_jax[0]), heads_torch[0].transpose(0, 2, 3, 1)
    assert hj.shape == ht.shape == (1, 13, 13, 425)
    close = np.isclose(hj, ht, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.998


def test_yolov2_tiny_forward_parity():
    spec, heads_jax, heads_torch = _run_both("yolov2-tiny", 416)
    assert len(heads_jax) == 1
    hj, ht = np.asarray(heads_jax[0]), heads_torch[0].transpose(0, 2, 3, 1)
    assert hj.shape == ht.shape == (1, 13, 13, 425)
    np.testing.assert_allclose(hj, ht, rtol=1e-3, atol=1e-3)


def test_reorg_is_darknet_not_space_to_depth():
    """_reorg must match Darknet's shuffle, which differs from a plain
    space-to-depth whenever C > s² — guard against the classic port bug."""
    from pytorch_yolo_tpu.models.darknet import _reorg
    from tests.oracle.torch_ref import reorg_oracle

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 6, 64)).astype(np.float32)  # NHWC
    ours = np.asarray(_reorg(jnp.asarray(x), 2))
    want = reorg_oracle(x.transpose(0, 3, 1, 2), 2).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, want)

    # plain space-to-depth (what naive ports implement) must NOT match
    t = x.reshape(2, 4, 2, 3, 2, 64).transpose(0, 1, 3, 2, 4, 5).reshape(2, 4, 3, 256)
    assert not np.array_equal(ours, t)


def test_yolov4_tiny_forward_parity():
    """CSP split routes (groups=2 group_id=1) + scale_x_y heads vs oracle."""
    spec, heads_jax, heads_torch = _run_both("yolov4-tiny", 416)
    assert len(heads_jax) == 2
    assert heads_jax[0].shape[1:3] == (13, 13)
    for hj, ht in zip(heads_jax, heads_torch):
        ht_nhwc = ht.transpose(0, 2, 3, 1)
        assert hj.shape == ht_nhwc.shape
        np.testing.assert_allclose(np.asarray(hj), ht_nhwc, rtol=1e-3, atol=1e-3)


def test_yolov4_forward_parity():
    """Full CSPDarknet53 + SPP + PAN (mish backbone) vs oracle.

    256² input keeps the CPU cost reasonable; every topology feature
    (CSP split/concat, SPP, PAN up+down fusion, mish) is exercised
    identically to 416²."""
    spec, heads_jax, heads_torch = _run_both("yolov4", 256)
    assert len(heads_jax) == 3
    assert [h.shape[1] for h in heads_jax] == [32, 16, 8]
    for hj, ht in zip(heads_jax, heads_torch):
        ht_nhwc = ht.transpose(0, 2, 3, 1)
        assert hj.shape == ht_nhwc.shape
        ours, theirs = np.asarray(hj), ht_nhwc
        close = np.isclose(ours, theirs, rtol=1e-3, atol=1e-3)
        assert close.mean() > 0.998, f"only {close.mean():.4%} within tight tol"
        rel = np.abs(ours - theirs) / (np.abs(theirs) + 1.0)
        assert rel.max() < 5e-2, f"worst-case rel drift {rel.max():.3e}"


def test_yolov4_csp_forward_parity():
    """Scaled-YOLOv4 (CSP-ized neck, all-mish body, logistic heads) vs oracle.

    Exercises the rCSP/BottleneckCSP2 neck blocks and the logistic head
    convs end-to-end; the heads are post-sigmoid so values live in (0,1)
    and absolute tolerance is meaningful."""
    spec, heads_jax, heads_torch = _run_both("yolov4-csp", 256)
    assert len(heads_jax) == 3
    assert [h.shape[1] for h in heads_jax] == [32, 16, 8]
    for hj, ht in zip(heads_jax, heads_torch):
        ht_nhwc = ht.transpose(0, 2, 3, 1)
        assert hj.shape == ht_nhwc.shape
        ours, theirs = np.asarray(hj), ht_nhwc
        assert ours.min() >= 0.0 and ours.max() <= 1.0  # logistic head output
        close = np.isclose(ours, theirs, rtol=1e-3, atol=1e-3)
        assert close.mean() > 0.998, f"only {close.mean():.4%} within tight tol"
        assert np.abs(ours - theirs).max() < 5e-2


def test_yolov4_p5_forward_parity():
    """Scaled-YOLOv4 P5 (yolov4-large): fully CSP-ized backbone incl.
    stage 1, n=3 CSP2 neck blocks, 4-anchor logistic heads.  256² input
    keeps CPU cost sane; topology arithmetic is resolution-independent."""
    spec, heads_jax, heads_torch = _run_both("yolov4-p5", 256)
    assert len(heads_jax) == 3
    assert [h.shape[1] for h in heads_jax] == [32, 16, 8]
    assert all(h.shape[-1] == 4 * 85 for h in heads_jax)  # 4 anchors/head
    for hj, ht in zip(heads_jax, heads_torch):
        ht_nhwc = ht.transpose(0, 2, 3, 1)
        assert hj.shape == ht_nhwc.shape
        ours, theirs = np.asarray(hj), ht_nhwc
        assert ours.min() >= 0.0 and ours.max() <= 1.0  # logistic heads
        close = np.isclose(ours, theirs, rtol=1e-3, atol=1e-3)
        assert close.mean() > 0.998, f"only {close.mean():.4%} within tight tol"
        assert np.abs(ours - theirs).max() < 5e-2


def test_yolov4_p6_forward_parity():
    """Scaled-YOLOv4 P6: 6 pyramid levels, 768-wide P5 stage, 4 heads at
    strides 8/16/32/64.  Synthetic weights saturate the logistic heads at
    this depth, so this test pins topology/layout/shapes; value-level
    4-anchor decode parity is covered by the mini-cfg tests in
    test_new_coords.py."""
    spec, heads_jax, heads_torch = _run_both("yolov4-p6", 128)
    assert len(heads_jax) == 4
    assert [h.shape[1] for h in heads_jax] == [16, 8, 4, 2]
    assert all(h.shape[-1] == 4 * 85 for h in heads_jax)
    for hj, ht in zip(heads_jax, heads_torch):
        ht_nhwc = ht.transpose(0, 2, 3, 1)
        assert hj.shape == ht_nhwc.shape
        np.testing.assert_allclose(np.asarray(hj), ht_nhwc, rtol=1e-3, atol=1e-3)


def test_yolov4_p7_forward_parity():
    """Scaled-YOLOv4 P7: 7 pyramid levels, 1.25x width ladder (stem 40,
    twin 1280-wide top stages), 5 heads at strides 8..128.  128² input is
    the smallest legal size (%128) and keeps the 338M-param CPU run sane;
    like P6, synthetic weights saturate the deep logistic heads so this
    pins topology/layout/shapes (value-level decode parity lives in the
    mini-cfg tests in test_new_coords.py)."""
    spec, heads_jax, heads_torch = _run_both("yolov4-p7", 128)
    assert len(heads_jax) == 5
    assert [h.shape[1] for h in heads_jax] == [16, 8, 4, 2, 1]
    assert all(h.shape[-1] == 4 * 85 for h in heads_jax)
    for hj, ht in zip(heads_jax, heads_torch):
        ht_nhwc = ht.transpose(0, 2, 3, 1)
        assert hj.shape == ht_nhwc.shape
        ours, theirs = np.asarray(hj), ht_nhwc
        assert ours.min() >= 0.0 and ours.max() <= 1.0  # logistic heads
        # the 365-layer trunk saturates the sigmoids to exact 0/1 under
        # synthetic weights; fp32 drift can flip isolated near-threshold
        # elements, so assert overwhelming (not bitwise) agreement
        close = np.isclose(ours, theirs, rtol=1e-3, atol=1e-3)
        assert close.mean() > 0.998, f"only {close.mean():.4%} within tight tol"


def test_yolov4x_mish_forward_parity():
    """yolov4x-mish (CSP-X: x1.25 width / x1.33 depth over yolov4-csp) vs
    oracle.  192² input offsets the ~2.3x FLOPs of the scaled body; the
    deeper (n=3) neck CSP2 blocks and 1.25x channel ladder are exercised
    end-to-end with logistic heads."""
    spec, heads_jax, heads_torch = _run_both("yolov4x-mish", 192)
    assert len(heads_jax) == 3
    assert [h.shape[1] for h in heads_jax] == [24, 12, 6]
    for hj, ht in zip(heads_jax, heads_torch):
        ht_nhwc = ht.transpose(0, 2, 3, 1)
        assert hj.shape == ht_nhwc.shape
        ours, theirs = np.asarray(hj), ht_nhwc
        assert ours.min() >= 0.0 and ours.max() <= 1.0  # logistic heads
        close = np.isclose(ours, theirs, rtol=1e-3, atol=1e-3)
        assert close.mean() > 0.998, f"only {close.mean():.4%} within tight tol"
        assert np.abs(ours - theirs).max() < 5e-2


def test_mish_matches_torch_softplus_form():
    """apply_activation('mish') == x * tanh(softplus(x)) incl. extremes."""
    import torch
    import torch.nn.functional as F

    from pytorch_yolo_tpu.models.darknet import apply_activation

    x = np.array([-100.0, -20.0, -1.0, -1e-3, 0.0, 1e-3, 1.0, 20.0, 100.0],
                 dtype=np.float32)
    ours = np.asarray(apply_activation(jnp.asarray(x), "mish"))
    want = (torch.from_numpy(x) * torch.tanh(F.softplus(torch.from_numpy(x)))).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-6, atol=1e-7)
    assert np.isfinite(ours).all()
