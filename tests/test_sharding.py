"""Multi-device batch sharding on the simulated 8-device CPU mesh.

SURVEY.md §4.2.4 / §2.3: data-parallel batch sharding via NamedSharding must
produce results identical to single-device execution, with XLA gathering
outputs over the (simulated) interconnect."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_yolo_tpu as pyt
from pytorch_yolo_tpu.parallel.sharding import (
    batch_sharding,
    make_batch_mesh,
    pad_to_multiple,
    replicate_params,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8, "conftest must force 8 CPU devices"
    return make_batch_mesh()


def test_mesh_shape(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("batch",)


def test_pad_to_multiple():
    assert pad_to_multiple(1, 8) == 8
    assert pad_to_multiple(8, 8) == 8
    assert pad_to_multiple(9, 8) == 16


def test_shard_batch_placement(mesh):
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sx = shard_batch(x, mesh)
    assert sx.sharding == batch_sharding(mesh)
    # each device holds one row
    assert {s.data.shape for s in sx.addressable_shards} == {(1, 4)}


def test_replicated_params(mesh):
    params = {"w": np.ones((3, 3), np.float32)}
    rp = replicate_params(params, mesh)
    assert len(rp["w"].sharding.device_set) == 8


def test_sharded_detector_matches_single_device(mesh):
    det_single = pyt.Detector.load("yolov3-tiny")
    det_mesh = pyt.Detector(det_single.spec,
                            jax.tree_util.tree_map(np.asarray, det_single.params),
                            mesh=mesh)
    imgs = np.random.default_rng(0).integers(0, 256, size=(8, 320, 320, 3), dtype=np.uint8)
    r_single = det_single.detect_batch(imgs, conf=0.3)
    r_mesh = det_mesh.detect_batch(imgs, conf=0.3)
    assert len(r_single) == len(r_mesh) == 8
    for a, b in zip(r_single, r_mesh):
        assert len(a) == len(b)
        np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-4, atol=1e-2)
        np.testing.assert_array_equal(a.cls_id, b.cls_id)


def test_sharded_detector_pads_ragged_batch(mesh):
    det = pyt.Detector.load("yolov3-tiny", mesh=mesh)
    imgs = np.random.default_rng(1).integers(0, 256, size=(5, 320, 320, 3), dtype=np.uint8)
    res = det.detect_batch(imgs, conf=0.3)
    assert len(res) == 5  # padding rows trimmed


def test_jitted_pipeline_output_is_batch_sharded(mesh):
    """The compiled program consumes sharded inputs and produces
    batch-sharded outputs (gather happens only at the final D2H)."""
    det = pyt.Detector.load("yolov3-tiny", mesh=mesh)
    imgs = np.zeros((8, 320, 320, 3), dtype=np.uint8)
    det.detect_batch(imgs, size=320, conf=0.5)  # compile + cache
    (key, fn), = det._pipelines.items()
    res = fn(det.params, jax.device_put(imgs, batch_sharding(mesh)))
    assert res.boxes.shape[0] == 8
    # result stays distributed across all 8 devices until host trim
    assert len(res.boxes.sharding.device_set) == 8


def test_submesh_of_four():
    """Detector on a 4-device submesh (mesh size independent of world size)."""
    devs = jax.devices()[:4]
    mesh4 = make_batch_mesh(devs)
    det = pyt.Detector.load("yolov3-tiny", mesh=mesh4)
    imgs = np.random.default_rng(2).integers(0, 256, size=(6, 256, 256, 3), dtype=np.uint8)
    res = det.detect_batch(imgs, size=256, conf=0.5)  # pads 6 -> 8
    assert len(res) == 6


def test_quantized_detector_on_mesh(mesh):
    """W8A8 int8 convs partition under GSPMD like the fp path: mesh results
    match single-device results exactly (same program, sharded batch)."""
    det_single = pyt.Detector.load("yolov3-tiny", quant="w8a8")
    det_mesh = pyt.Detector(det_single.spec,
                            {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                             for k, v in det_single.params.items()},
                            mesh=mesh)  # pre-quantized params auto-detected
    imgs = np.stack([np.random.default_rng(i).integers(0, 256, (480, 640, 3),
                                                       dtype=np.uint8)
                     for i in range(8)])
    r_single = det_single.detect_batch(imgs, conf=0.4)
    r_mesh = det_mesh.detect_batch(imgs, conf=0.4)
    for a, b in zip(r_single, r_mesh):
        assert len(a) == len(b)
        np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-4, atol=1e-2)


def test_static_int8_resident_on_mesh(mesh):
    """Static-calibration int8 with int8-resident chains (round-3 path)
    under GSPMD: mesh results match single-device exactly (same program
    partitioned over batch — int8 tensors shard like fp ones)."""
    rng = np.random.default_rng(5)
    calib = [rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
             for _ in range(2)]
    det_single = pyt.Detector.load("yolov3-tiny", quant="w8a8",
                                   quant_calib=calib)
    assert any("sa" in p for p in det_single.params.values())
    det_mesh = pyt.Detector(det_single.spec,
                            {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                             for k, v in det_single.params.items()},
                            mesh=mesh)  # pre-quantized static params adopted
    imgs = np.stack([np.random.default_rng(i).integers(
        0, 256, (240, 320, 3), dtype=np.uint8) for i in range(8)])
    r_single = det_single.detect_batch(imgs, size=320, conf=0.4)
    r_mesh = det_mesh.detect_batch(imgs, size=320, conf=0.4)
    for a, b in zip(r_single, r_mesh):
        assert len(a) == len(b)
        np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-4, atol=1e-2)


def test_bf16_serving_default_on_mesh(mesh):
    """The shipped bf16 serving config (S2D stem auto-on for conv_conv)
    must shard: packed stem weights are built at trace time from the
    replicated params, so the transform has to compose with GSPMD."""
    spec = __import__("pytorch_yolo_tpu.models.zoo",
                      fromlist=["model_spec"]).model_spec("yolov3")
    from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params

    params = fold_batchnorm(spec, random_raw_params(spec, seed=7))
    host = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
            for k, v in params.items()}
    det_single = pyt.Detector(spec, host, compute_dtype=jnp.bfloat16,
                              precision="default")
    det_mesh = pyt.Detector(spec, host, compute_dtype=jnp.bfloat16,
                            precision="default", mesh=mesh)
    assert det_single.stem_s2d and det_mesh.stem_s2d
    imgs = np.random.default_rng(2).integers(
        0, 256, size=(8, 96, 128, 3), dtype=np.uint8)
    r_single = det_single.detect_batch(imgs, size=96, conf=0.2)
    r_mesh = det_mesh.detect_batch(imgs, size=96, conf=0.2)
    assert len(r_single) == len(r_mesh) == 8
    # Structural validity of every mesh detection...
    for b in r_mesh:
        assert b.boxes.shape[1:] == (4,)
        assert np.isfinite(b.boxes).all()
        assert ((b.cls_id >= 0) & (b.cls_id < 80)).all()
    # ...plus a quantitative bound (VERDICT r2 #7): bf16 + random weights
    # means a differently-partitioned program may reorder near-tie
    # detections, so exact equality is the wrong property (the fp32 test
    # above pins that) — but one-to-one matched drift between the mesh and
    # single-device runs must stay inside the same envelope the hardware
    # drift table allows the serving default (agree>=0.85, sub-2px boxes).
    from pytorch_yolo_tpu.utils.drift import detection_drift

    stats = detection_drift(r_single, r_mesh)
    assert stats.set_agreement >= 0.85, stats.row()
    assert stats.box_p99_px <= 2.0, stats.row()


def test_int8sb_serving_mode_on_mesh(mesh):
    """The measured-fastest yolov3 serving mode (int8 core + bf16 glue +
    early-layer skip + S2D stem — perf/int8_serving_ab_r3.jsonl) under
    GSPMD: policy engages on both detectors, and mesh-vs-single drift
    stays inside the serving envelope (bf16 near-ties may reorder, so
    matched drift, not exact equality)."""
    from pytorch_yolo_tpu.models.zoo import model_spec
    from pytorch_yolo_tpu.ops.quant import early_conv_indices
    from pytorch_yolo_tpu.utils.drift import detection_drift
    from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params

    spec = model_spec("yolov3")
    params = fold_batchnorm(spec, random_raw_params(spec, seed=9))
    host = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
            for k, v in params.items()}
    rng = np.random.default_rng(9)
    calib = [rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
             for _ in range(2)]
    kw = dict(quant="w8a8", quant_calib=calib,
              compute_dtype=jnp.bfloat16, precision="default")
    det_single = pyt.Detector(spec, host, **kw)
    det_mesh = pyt.Detector(spec, host, mesh=mesh, **kw)
    early = early_conv_indices(spec, 8)
    for det in (det_single, det_mesh):
        assert det.stem_s2d
        assert all("wq" not in det.params[i] for i in early)
        assert any("sa" in p for p in det.params.values())
    imgs = np.random.default_rng(3).integers(
        0, 256, size=(8, 96, 128, 3), dtype=np.uint8)
    r_single = det_single.detect_batch(imgs, size=96, conf=0.2)
    r_mesh = det_mesh.detect_batch(imgs, size=96, conf=0.2)
    assert len(r_single) == len(r_mesh) == 8
    stats = detection_drift(r_single, r_mesh)
    assert stats.set_agreement >= 0.85, stats.row()
    assert stats.box_p99_px <= 2.0, stats.row()


def test_yolov4_tiny_on_mesh_matches_single(mesh):
    """The v4 family's new graph shapes (CSP split routes slice the channel
    axis; batch stays the only sharded axis) are GSPMD-clean: mesh results
    == single-device results numerically."""
    det_single = pyt.Detector.load("yolov4-tiny")
    det_mesh = pyt.Detector(det_single.spec,
                            jax.tree_util.tree_map(np.asarray, det_single.params),
                            mesh=mesh)
    imgs = np.random.default_rng(4).integers(
        0, 256, size=(8, 96, 128, 3), dtype=np.uint8)
    r_single = det_single.detect_batch(imgs, size=96, conf=0.3)
    r_mesh = det_mesh.detect_batch(imgs, size=96, conf=0.3)
    assert len(r_single) == len(r_mesh) == 8
    for a, b in zip(r_single, r_mesh):
        assert len(a) == len(b)
        np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-4, atol=1e-2)
        np.testing.assert_array_equal(a.cls_id, b.cls_id)


def test_stride64_4anchor_on_mesh_matches_single(mesh, tmp_path):
    """Scaled-YOLOv4-large head geometry (4 anchors, stride-64 grid) under
    GSPMD batch sharding == single device.  Uses the mini-P6 cfg so the
    8-way CPU mesh test stays cheap; the full yolov4-p6 shares the exact
    decode/NMS code path."""
    from tests.test_new_coords import MINI_P6_CFG

    cfg = tmp_path / "mini-p6.cfg"
    cfg.write_text(MINI_P6_CFG)
    det_single = pyt.Detector.load(str(cfg))
    det_mesh = pyt.Detector(det_single.spec,
                            jax.tree_util.tree_map(np.asarray, det_single.params),
                            mesh=mesh)
    imgs = np.random.default_rng(11).integers(
        0, 256, size=(8, 96, 128, 3), dtype=np.uint8)
    r_single = det_single.detect_batch(imgs, size=64, conf=0.05)
    r_mesh = det_mesh.detect_batch(imgs, size=64, conf=0.05)
    assert len(r_single) == len(r_mesh) == 8
    for a, b in zip(r_single, r_mesh):
        assert len(a) == len(b)
        np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-4, atol=1e-2)
        np.testing.assert_array_equal(a.cls_id, b.cls_id)


def test_stride128_p7_head_on_mesh_matches_single(mesh, tmp_path):
    """yolov4-p7's seventh pyramid level (stride-128 head) under GSPMD
    batch sharding == single device, at the smallest legal input (%128).
    Mini cfg derived exactly as test_mini_p7_stride128_end_to_end does."""
    from tests.test_new_coords import MINI_P6_CFG

    cfg_txt = MINI_P6_CFG.replace(
        "[convolutional]\nfilters=340",
        "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\nstride=2\n"
        "pad=1\nactivation=mish\n\n[convolutional]\nfilters=340")
    cfg = tmp_path / "mini-p7.cfg"
    cfg.write_text(cfg_txt.replace("width=64", "width=128")
                          .replace("height=64", "height=128"))
    det_single = pyt.Detector.load(str(cfg))
    det_mesh = pyt.Detector(det_single.spec,
                            jax.tree_util.tree_map(np.asarray, det_single.params),
                            mesh=mesh)
    imgs = np.random.default_rng(23).integers(
        0, 256, size=(8, 96, 160, 3), dtype=np.uint8)
    r_single = det_single.detect_batch(imgs, size=128, conf=0.05)
    r_mesh = det_mesh.detect_batch(imgs, size=128, conf=0.05)
    assert len(r_single) == len(r_mesh) == 8
    for a, b in zip(r_single, r_mesh):
        assert len(a) == len(b)
        np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-4, atol=1e-2)
        np.testing.assert_array_equal(a.cls_id, b.cls_id)


def test_detect_many_prepared_pipeline_on_mesh_matches_single(mesh):
    """detect_many (host letterbox -> prepared pipeline) under GSPMD batch
    sharding == single device — the path `evaluate --devices N` takes."""
    from pytorch_yolo_tpu.models.zoo import model_spec
    from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params

    spec = model_spec("yolov3-tiny")
    params = fold_batchnorm(spec, random_raw_params(spec, seed=9))
    host = jax.tree_util.tree_map(np.asarray, params)
    det_single = pyt.Detector(spec, host)
    det_mesh = pyt.Detector(spec, host, mesh=mesh)
    rng = np.random.default_rng(31)
    imgs = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for h, w in ((200, 320), (240, 180), (160, 160), (300, 220),
                         (220, 300))]
    a = det_single.detect_many(imgs, size=320, conf=0.3, batch=8)
    b = det_mesh.detect_many(imgs, size=320, conf=0.3, batch=8)
    assert len(a) == len(b) == 5
    for da, db in zip(a, b):
        assert len(da) == len(db)
        np.testing.assert_allclose(da.boxes, db.boxes, rtol=1e-4, atol=1e-2)
        np.testing.assert_array_equal(da.cls_id, db.cls_id)


def test_detect_stream_on_mesh_matches_single(mesh):
    """Batch-1 stream dispatches pad to the mesh size (both raw and
    host_preproc paths) and yield the single-device results."""
    from pytorch_yolo_tpu.models.zoo import model_spec
    from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params

    spec = model_spec("yolov3-tiny")
    params = fold_batchnorm(spec, random_raw_params(spec, seed=13))
    host = jax.tree_util.tree_map(np.asarray, params)
    det_single = pyt.Detector(spec, host)
    det_mesh = pyt.Detector(spec, host, mesh=mesh)
    rng = np.random.default_rng(41)
    imgs = [rng.integers(0, 256, size=(200, 320, 3), dtype=np.uint8)
            for _ in range(3)]
    for hp in (False, True):
        a = list(det_single.detect_stream(iter(imgs), size=320, conf=0.3,
                                          host_preproc=hp))
        b = list(det_mesh.detect_stream(iter(imgs), size=320, conf=0.3,
                                        host_preproc=hp))
        assert len(a) == len(b) == 3
        for da, db in zip(a, b):
            assert len(da) == len(db)
            np.testing.assert_allclose(da.boxes, db.boxes,
                                       rtol=1e-4, atol=1e-2)


def test_run_video_on_mesh_matches_single(mesh, tmp_path):
    """video --devices N path: run_video's batch-1 raw dispatches pad to
    the mesh and match the single-device detections."""
    import pytest

    cv2 = pytest.importorskip("cv2")
    from pytorch_yolo_tpu.models.zoo import model_spec
    from pytorch_yolo_tpu.video import run_video
    from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params

    src = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (320, 240))
    rng = np.random.default_rng(6)
    for _ in range(4):
        w.write(rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8))
    w.release()

    spec = model_spec("yolov3-tiny")
    params = fold_batchnorm(spec, random_raw_params(spec, seed=21))
    host = jax.tree_util.tree_map(np.asarray, params)
    a = list(run_video(src, pyt.Detector(spec, host), size=320, conf=0.4))
    b = list(run_video(src, pyt.Detector(spec, host, mesh=mesh),
                       size=320, conf=0.4))
    assert [r.index for r in a] == [r.index for r in b] == [0, 1, 2, 3]
    for ra, rb in zip(a, b):
        assert len(ra.detection) == len(rb.detection)
        np.testing.assert_allclose(ra.detection.boxes, rb.detection.boxes,
                                   rtol=1e-4, atol=1e-2)


def test_smooth_int8_on_mesh_matches_single(mesh):
    """Per-channel smoothed grids (quant_smooth) under GSPMD: the vector
    `sa` dequant and grid-folded kernels partition over batch exactly like
    the scalar-scale path — mesh results match single-device."""
    rng = np.random.default_rng(11)
    calib = [rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
             for _ in range(2)]
    det_single = pyt.Detector.load("yolov3-tiny", quant="w8a8",
                                   quant_calib=calib, quant_smooth=0.5)
    assert any("sa" in p and np.asarray(p["sa"]).ndim == 1
               for p in det_single.params.values())
    det_mesh = pyt.Detector(det_single.spec,
                            {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                             for k, v in det_single.params.items()},
                            mesh=mesh)  # pre-quantized smoothed params adopted
    imgs = np.stack([np.random.default_rng(100 + i).integers(
        0, 256, (240, 320, 3), dtype=np.uint8) for i in range(8)])
    r_single = det_single.detect_batch(imgs, size=320, conf=0.4)
    r_mesh = det_mesh.detect_batch(imgs, size=320, conf=0.4)
    for a, b in zip(r_single, r_mesh):
        assert len(a) == len(b)
        np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-4, atol=1e-2)
