"""Orbax checkpoint persistence of the converted params pytree (SURVEY.md §5.4)."""

import numpy as np
import pytest

import pytorch_yolo_tpu as pyt
from pytorch_yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_round_trip(tmp_path):
    det = pyt.Detector.load("yolov3-tiny")
    ckpt = str(tmp_path / "ckpt")
    det.save_checkpoint(ckpt)

    det2 = pyt.Detector.from_checkpoint(ckpt)
    assert det2.spec == det.spec
    assert det2.class_names == det.class_names
    for idx in det.params:
        np.testing.assert_array_equal(
            np.asarray(det2.params[idx]["w"]), np.asarray(det.params[idx]["w"]))
        np.testing.assert_array_equal(
            np.asarray(det2.params[idx]["b"]), np.asarray(det.params[idx]["b"]))

    img = np.random.default_rng(0).integers(0, 256, (240, 320, 3), dtype=np.uint8)
    a = det.detect(img, size=320, conf=0.5)
    b = det2.detect(img, size=320, conf=0.5)
    assert len(a) == len(b)
    np.testing.assert_allclose(a.boxes, b.boxes, rtol=0, atol=0)


def test_checkpoint_version_guard(tmp_path):
    det = pyt.Detector.load("yolov3-tiny")
    ckpt = str(tmp_path / "ckpt")
    det.save_checkpoint(ckpt)
    import json, os

    meta_path = os.path.join(ckpt, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["format_version"] = 999
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="newer"):
        load_checkpoint(ckpt)


def test_checkpoint_from_bf16_detector_stays_fp32(tmp_path):
    """ADVICE.md r1 (medium): a bf16-compute Detector must not silently
    persist bf16 kernels — checkpoints are fp32 canonical."""
    import jax.numpy as jnp

    det32 = pyt.Detector.load("yolov3-tiny")
    det16 = pyt.Detector(det32.spec,
                         {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                          for k, v in det32.params.items()},
                         cfg_text=det32.cfg_text, compute_dtype=jnp.bfloat16)
    # live kernels really are bf16 (the risky precondition)
    assert det16.params[0]["w"].dtype == jnp.bfloat16
    ckpt = str(tmp_path / "ckpt16")
    det16.save_checkpoint(ckpt)
    det3 = pyt.Detector.from_checkpoint(ckpt)
    for idx in det32.params:
        assert np.asarray(det3.params[idx]["w"]).dtype == np.float32
        np.testing.assert_array_equal(np.asarray(det3.params[idx]["w"]),
                                      np.asarray(det32.params[idx]["w"]))


def test_detector_without_cfg_text_refuses(tmp_path):
    spec = pyt.model_spec("yolov3-tiny")
    params = pyt.fold_batchnorm(spec, pyt.random_raw_params(spec))
    det = pyt.Detector(spec, params)
    with pytest.raises(ValueError, match="cfg text"):
        det.save_checkpoint(str(tmp_path / "c"))


def test_checkpoint_refuses_laundered_bf16_params(tmp_path):
    """Params that ARRIVE bf16 must not be upcast into a 'canonical' fp32
    checkpoint (code-review r2 finding)."""
    import jax.numpy as jnp

    det = pyt.Detector.load("yolov3-tiny")
    bf16_params = {k: {kk: np.asarray(jnp.asarray(vv).astype(jnp.bfloat16))
                       for kk, vv in v.items()}
                   for k, v in det.params.items()}
    det16 = pyt.Detector(det.spec, bf16_params, cfg_text=det.cfg_text,
                         compute_dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="fp32"):
        det16.save_checkpoint(str(tmp_path / "c"))
    # and opting out of the fp32 host copy also refuses (fp32 source)
    fp32_params = {k: {kk: np.asarray(vv, np.float32) for kk, vv in v.items()}
                   for k, v in det.params.items()}
    det_nocopy = pyt.Detector(det.spec, fp32_params, cfg_text=det.cfg_text,
                              compute_dtype=jnp.bfloat16,
                              keep_fp32_params=False)
    with pytest.raises(ValueError, match="fp32"):
        det_nocopy.save_checkpoint(str(tmp_path / "c2"))
