"""CLI tests (reference components #9-#11: detect.py, video/cam demos)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pytorch_yolo_tpu.cli import main
from pytorch_yolo_tpu.models.zoo import model_spec, write_cfg
from pytorch_yolo_tpu.weights import random_raw_params, write_weights_file


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_assets")
    cfg = str(d / "tiny.cfg")
    weights = str(d / "tiny.weights")
    write_cfg("yolov3-tiny", cfg)
    spec = model_spec("yolov3-tiny")
    write_weights_file(spec, random_raw_params(spec, seed=42), weights)
    img_dir = d / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(img_dir / f"im{i}.png"),
                    rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8))
    return {"cfg": cfg, "weights": weights, "imgs": str(img_dir), "dir": d}


def test_detect_directory(assets, tmp_path):
    out = str(tmp_path / "det")
    rc = main(["detect", "--images", assets["imgs"], "--det", out,
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--confidence", "0.5", "--reso", "320"])
    assert rc == 0
    written = sorted(os.listdir(out))
    assert written == ["det_im0.png", "det_im1.png"]
    assert cv2.imread(os.path.join(out, written[0])).shape == (240, 320, 3)


def test_detect_single_image(assets, tmp_path):
    out = str(tmp_path / "det1")
    img = os.path.join(assets["imgs"], "im0.png")
    rc = main(["detect", "--images", img, "--det", out,
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--reso", "320"])
    assert rc == 0
    assert os.listdir(out) == ["det_im0.png"]


def test_export_cfg(tmp_path):
    out = str(tmp_path / "y.cfg")
    rc = main(["export-cfg", "--model", "yolov3", "--out", out])
    assert rc == 0
    from pytorch_yolo_tpu.config import load_model_spec

    assert len(load_model_spec(out).layers) == 107


def test_video_pipeline(assets, tmp_path):
    # synthesize a tiny video file
    src = str(tmp_path / "src.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (320, 240))
    rng = np.random.default_rng(1)
    for _ in range(12):
        w.write(rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8))
    w.release()

    out = str(tmp_path / "out.mp4")
    rc = main(["video", "--source", src, "--out", out,
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--reso", "320", "--frames", "10"])
    assert rc == 0
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 10


def test_video_results_ordered_and_match_single(assets, tmp_path):
    """Pipelined loop yields frames in order with the same detections as
    the one-shot API."""
    import pytorch_yolo_tpu as pyt
    from pytorch_yolo_tpu.video import run_video

    src = str(tmp_path / "o.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (320, 240))
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8) for _ in range(6)]
    for f in frames:
        w.write(f)
    w.release()

    det = pyt.Detector.load(assets["cfg"], assets["weights"])
    results = list(run_video(src, det, size=320, conf=0.5))
    assert [r.index for r in results] == list(range(6))
    # decoded frames are lossy (mp4) — compare detections on the decoded frame
    for r in results[:2]:
        solo = det.detect(r.frame, size=320, conf=0.5)
        assert len(solo) == len(r.detection)
        np.testing.assert_allclose(solo.boxes, r.detection.boxes, rtol=1e-4, atol=1e-2)


def test_detect_save_json(assets, tmp_path):
    import json as _json

    out = str(tmp_path / "detj")
    rc = main(["detect", "--images", assets["imgs"], "--det", out,
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--reso", "320", "--save-json"])
    assert rc == 0
    with open(os.path.join(out, "detections.jsonl")) as f:
        lines = f.read().splitlines()
    assert len(lines) == 2
    rec = _json.loads(lines[0])
    assert {"image", "boxes", "obj", "cls_score", "cls_id", "names"} <= set(rec)


def test_video_tolerates_decoder_errors(assets, monkeypatch):
    """Frames whose decode raises are skipped, not fatal (SURVEY.md §5.3)."""
    import pytorch_yolo_tpu as pyt
    from pytorch_yolo_tpu import video as video_mod

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8) for _ in range(6)]

    class FlakyCap:
        def __init__(self, src):
            self.i = 0

        def isOpened(self):
            return True

        def read(self):
            i = self.i
            self.i += 1
            if i in (2, 4):
                raise RuntimeError("decoder glitch")
            if i >= 6:
                return False, None
            return True, frames[i]

        def release(self):
            pass

    monkeypatch.setattr(video_mod, "cv2", None, raising=False)
    import cv2 as real_cv2

    class FakeCv2:
        VideoCapture = FlakyCap

    import sys as _sys
    monkeypatch.setitem(_sys.modules, "cv2", FakeCv2)
    try:
        det = pyt.Detector.load(assets["cfg"], assets["weights"])
        results = list(video_mod.run_video("x.mp4", det, size=320, conf=0.5))
    finally:
        monkeypatch.setitem(_sys.modules, "cv2", real_cv2)
    # 6 reads, 2 raised -> 4 good frames
    assert len(results) == 4
    assert [r.index for r in results] == [0, 1, 3, 5]


def test_info_command(capsys):
    rc = main(["info", "--model", "yolov3-tiny"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "8,858,734" in out and "detections @416: 2535" in out


def test_info_topology_pin_status(capsys):
    """`info` surfaces per-model topology provenance (VERDICT r3 weak #3):
    upstream-pinned for the byte-verified families, an explicit divergence
    caveat for yolov4-p7's self-pinned ladder."""
    rc = main(["info", "--model", "yolov4-p7"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "topology: self-pinned" in out
    assert "338,626,204" in out and "287.75M" in out

    rc = main(["info", "--model", "yolov4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "topology: upstream" in out

    rc = main(["info", "--model", "yolov4-csp"])
    assert rc == 0
    assert "topology: self-pinned" in capsys.readouterr().out


def test_topology_pins_cover_zoo():
    """Every zoo model carries a pin-status entry (a new generator without
    provenance disclosure fails here)."""
    from pytorch_yolo_tpu.models.zoo import TOPOLOGY_PINS, available_models

    assert set(TOPOLOGY_PINS) == set(available_models())
    assert all(s in ("upstream", "self-pinned")
               for s, _ in TOPOLOGY_PINS.values())


def test_info_int8_plan(capsys):
    """--int8-plan prints the default quantization policy: yolov3 engages
    the early skip (10 early + 3 head convs fp) and flags the measured
    worst-noise concat convs 87/99; tiny keeps its resident ladder."""
    rc = main(["info", "--model", "yolov3", "--int8-plan"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "early-skip profitable: True" in out
    assert "convs quantized: 62/75" in out and "3 head + 10 early" in out
    assert "[87, 99]" in out

    rc = main(["info", "--model", "yolov3-tiny", "--int8-plan"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "early-skip profitable: False" in out
    assert "int8-resident chain links: 6" in out


def test_module_runner_entry():
    """`python -m pytorch_yolo_tpu` works (package __main__)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "pytorch_yolo_tpu", "info", "--model", "yolov3-tiny"],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "detections @416: 2535" in out.stdout


def test_detect_int8_static_calib(assets, tmp_path):
    """--int8 --int8-calib DIR bakes static activation scales (cli ->
    Detector(quant_calib=...)) and still writes detections."""
    out = str(tmp_path / "det_int8s")
    rc = main(["detect", "--images", assets["imgs"], "--det", out,
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--confidence", "0.4", "--reso", "320",
               "--int8", "--int8-calib", assets["imgs"]])
    assert rc == 0
    assert sorted(os.listdir(out)) == ["det_im0.png", "det_im1.png"]


def test_int8_calib_empty_dir_errors(assets, tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no readable images"):
        main(["detect", "--images", assets["imgs"], "--det",
              str(tmp_path / "d"), "--cfg", assets["cfg"],
              "--weights", assets["weights"], "--reso", "320",
              "--int8", "--int8-calib", str(empty)])


def test_detect_sharded_over_mesh_matches_single(assets, tmp_path):
    """--devices N builds a GSPMD batch mesh inside the CLI (the
    multi-chip production path, SURVEY §2.3); detections must match the
    single-device run exactly at fp32 (save-json output compared)."""
    import json

    outs = {}
    for n in (1, 4):
        out = str(tmp_path / f"det_mesh{n}")
        rc = main(["detect", "--images", assets["imgs"], "--det", out,
                   "--cfg", assets["cfg"], "--weights", assets["weights"],
                   "--reso", "320", "--devices", str(n), "--save-json"])
        assert rc == 0
        path = os.path.join(out, "detections.jsonl")
        outs[n] = [json.loads(l) for l in open(path)]
    assert len(outs[1]) == len(outs[4]) == 2
    for a, b in zip(sorted(outs[1], key=lambda r: r["image"]),
                    sorted(outs[4], key=lambda r: r["image"])):
        assert a["image"] == b["image"]
        assert a["cls_id"] == b["cls_id"]
        np.testing.assert_allclose(a["boxes"], b["boxes"],
                                   rtol=1e-4, atol=1e-2)


def test_detect_devices_overflow_errors(assets, tmp_path):
    with pytest.raises(SystemExit, match="local"):
        main(["detect", "--images", assets["imgs"],
              "--det", str(tmp_path / "x"),
              "--cfg", assets["cfg"], "--weights", assets["weights"],
              "--reso", "320", "--devices", "64"])


def test_detect_many_on_mesh_via_cli_batch_rounding(assets, tmp_path):
    """--devices 3 with --batch 8: the CLI rounds the prepared-pipeline
    bucket up to a mesh multiple (9) instead of tripping GSPMD divisibility
    at the first chunk."""
    out = str(tmp_path / "det_m3")
    rc = main(["detect", "--images", assets["imgs"], "--det", out,
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--reso", "320", "--devices", "3", "--batch", "8"])
    assert rc == 0
    assert sorted(os.listdir(out)) == ["det_im0.png", "det_im1.png"]


def test_int8_scales_file_write_then_load(assets, tmp_path):
    """--int8-scales JSON: first run calibrates (via --int8-calib) and
    writes the scales; second run loads them with no calibration forward
    and produces identical detections.jsonl."""
    import json as _json

    scales = str(tmp_path / "scales.json")
    outs = {}
    for tag in ("calib", "loaded"):
        out = str(tmp_path / f"det_{tag}")
        argv = ["detect", "--images", assets["imgs"], "--det", out,
                "--cfg", assets["cfg"], "--weights", assets["weights"],
                "--reso", "320", "--int8", "--int8-scales", scales,
                "--save-json"]
        if tag == "calib":
            argv += ["--int8-calib", assets["imgs"]]
        assert main(argv) == 0
        outs[tag] = open(os.path.join(out, "detections.jsonl")).read()
    saved = _json.load(open(scales))
    # quant_state() format: scales + the resolved skip set (reload
    # reproduces the exact quantized-conv partition).  Since the round-4
    # default flip, bare --int8-calib resolves to the auto recipe
    # (p99.9 + smooth + bias-correct), so scales are per-channel smooth
    # grids ({"per_channel": [...]}) — or plain floats for convs the
    # smoother can't fold — the file carries the recipe stamp, and
    # bias-correct deltas persist alongside.
    assert saved["version"] == 1
    assert saved["recipe"] == "auto"
    assert saved["scales"]

    def _positive(v):
        if isinstance(v, dict):
            return all(s > 0 for s in v["per_channel"])
        if isinstance(v, list):  # split-concat per-branch scales
            return all(s > 0 for s in v)
        return float(v) > 0

    assert all(_positive(v) for v in saved["scales"].values())
    assert any(isinstance(v, dict) for v in saved["scales"].values()), \
        "auto recipe should persist at least one per-channel smooth grid"
    assert saved["bias_delta"], "auto recipe includes bias-correct deltas"
    assert isinstance(saved["skip"], list)
    assert outs["calib"] == outs["loaded"]


def test_int8_scales_legacy_flat_format_loads(assets, tmp_path):
    """Pre-quant_state() scale files (flat {idx: scale}) still load, under
    the default skip policy."""
    import json as _json

    import pytorch_yolo_tpu as pyt

    det = pyt.Detector.load(assets["cfg"], assets["weights"], quant="w8a8",
                            quant_calib=[np.zeros((64, 64, 3), np.uint8)])
    scales = str(tmp_path / "flat.json")
    with open(scales, "w") as f:
        _json.dump(det.act_scales(), f)  # legacy: no version/skip wrapper
    out = str(tmp_path / "det_flat")
    rc = main(["detect", "--images", assets["imgs"], "--det", out,
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--reso", "320", "--int8", "--int8-scales", scales])
    assert rc == 0
    assert sorted(os.listdir(out)) == ["det_im0.png", "det_im1.png"]


def test_int8_skip_noisy_cli(assets, tmp_path):
    """--int8-skip-noisy K skips the K noisiest quantized convs and the
    persisted quant_state() skip set reproduces it on reload."""
    import json as _json

    scales = str(tmp_path / "noisy.json")
    out = str(tmp_path / "det_noisy")
    rc = main(["detect", "--images", assets["imgs"], "--det", out,
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--reso", "320", "--int8", "--int8-calib", assets["imgs"],
               "--int8-skip-noisy", "2", "--int8-scales", scales])
    assert rc == 0
    saved = _json.load(open(scales))
    # baseline (no noisy skip) for the same model/images
    base = str(tmp_path / "base.json")
    rc = main(["detect", "--images", assets["imgs"],
               "--det", str(tmp_path / "det_base"),
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--reso", "320", "--int8", "--int8-calib", assets["imgs"],
               "--int8-scales", base])
    assert rc == 0
    base_saved = _json.load(open(base))
    assert len(saved["skip"]) == len(base_saved["skip"]) + 2
    # re-calibrating over an existing scales file with --int8-skip-noisy
    # is refused (the persisted skip set would silently win)
    with pytest.raises(SystemExit, match="already exists"):
        main(["detect", "--images", assets["imgs"],
              "--det", str(tmp_path / "det_err"),
              "--cfg", assets["cfg"], "--weights", assets["weights"],
              "--reso", "320", "--int8", "--int8-calib", assets["imgs"],
              "--int8-skip-noisy", "2", "--int8-scales", scales])


def test_int8_skip_noisy_requires_calib(assets, tmp_path):
    with pytest.raises(SystemExit, match="requires --int8-calib"):
        main(["detect", "--images", assets["imgs"],
              "--det", str(tmp_path / "x"), "--cfg", assets["cfg"],
              "--weights", assets["weights"], "--reso", "320",
              "--int8", "--int8-skip-noisy", "4"])


def test_int8_scales_missing_without_calib_errors(assets, tmp_path):
    with pytest.raises(SystemExit, match="does not exist"):
        main(["detect", "--images", assets["imgs"],
              "--det", str(tmp_path / "x"), "--cfg", assets["cfg"],
              "--weights", assets["weights"], "--reso", "320",
              "--int8", "--int8-scales", str(tmp_path / "nope.json")])


def test_rectangular_reso(assets, tmp_path):
    """--reso HxW drives the API's rectangular net-input form."""
    out = str(tmp_path / "det_rect")
    rc = main(["detect", "--images", assets["imgs"], "--det", out,
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--reso", "256x320"])
    assert rc == 0
    assert sorted(os.listdir(out)) == ["det_im0.png", "det_im1.png"]
    with pytest.raises(ValueError, match="multiple of 32"):
        main(["detect", "--images", assets["imgs"],
              "--det", str(tmp_path / "x"), "--cfg", assets["cfg"],
              "--weights", assets["weights"], "--reso", "250x320"])


def test_jax_platforms_env_honored_in_subprocess():
    """Package import re-asserts the standard JAX_PLATFORMS env var over
    container sitecustomize hooks that force-register a tunneled TPU
    plugin by writing jax.config directly.  Env-var-only pinning
    demonstrably still initialized the tunnel backend (r3 session 5:
    the asset drill's evaluate child hung in axon init during a grant
    outage despite JAX_PLATFORMS=cpu in its environment) — this guards
    every CLI/tool subprocess a CPU-pinned caller spawns."""
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    out = subprocess.run(
        [sys.executable, "-c",
         "import pytorch_yolo_tpu, jax; print(jax.default_backend())"],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "cpu"


def test_int8_split_concat_cli(assets, tmp_path):
    """--int8-split-concat calibrates per-branch scales for the concat
    conv (persisted as a list in the quant_state file) and the reload
    reproduces detections exactly."""
    import json as _json

    scales = str(tmp_path / "split.json")
    outs = {}
    for tag in ("calib", "loaded"):
        out = str(tmp_path / f"det_split_{tag}")
        argv = ["detect", "--images", assets["imgs"], "--det", out,
                "--cfg", assets["cfg"], "--weights", assets["weights"],
                "--reso", "320", "--int8", "--int8-scales", scales,
                "--save-json"]
        if tag == "calib":
            argv += ["--int8-calib", assets["imgs"], "--int8-split-concat"]
        assert main(argv) == 0
        outs[tag] = open(os.path.join(out, "detections.jsonl")).read()
    saved = _json.load(open(scales))
    assert isinstance(saved["scales"]["21"], list)  # tiny's concat conv
    assert outs["calib"] == outs["loaded"]
    with pytest.raises(SystemExit, match="requires --int8-calib"):
        main(["detect", "--images", assets["imgs"],
              "--det", str(tmp_path / "x"), "--cfg", assets["cfg"],
              "--weights", assets["weights"], "--reso", "320",
              "--int8", "--int8-split-concat"])


def test_int8_smooth_cli(assets, tmp_path):
    """--int8-smooth calibrates per-channel grids (persisted as
    per_channel dicts) and the reload reproduces detections exactly."""
    import json as _json

    scales = str(tmp_path / "smooth.json")
    outs = {}
    for tag in ("calib", "loaded"):
        out = str(tmp_path / f"det_sm_{tag}")
        argv = ["detect", "--images", assets["imgs"], "--det", out,
                "--cfg", assets["cfg"], "--weights", assets["weights"],
                "--reso", "320", "--int8", "--int8-scales", scales,
                "--save-json"]
        if tag == "calib":
            argv += ["--int8-calib", assets["imgs"], "--int8-smooth"]
        assert main(argv) == 0
        outs[tag] = open(os.path.join(out, "detections.jsonl")).read()
    saved = _json.load(open(scales))
    assert any(isinstance(v, dict) and "per_channel" in v
               for v in saved["scales"].values())
    assert outs["calib"] == outs["loaded"]
    with pytest.raises(SystemExit, match="requires --int8-calib"):
        main(["detect", "--images", assets["imgs"],
              "--det", str(tmp_path / "x"), "--cfg", assets["cfg"],
              "--weights", assets["weights"], "--reso", "320",
              "--int8", "--int8-smooth", "0.5"])


def test_int8_recipe_restart_safe(assets, tmp_path):
    """--int8-recipe auto: first run calibrates (trio knobs) and stamps the
    scales file; a RESTART with the identical command line loads it (no
    re-calibration error) and reproduces the detections.  A file produced
    by explicit knobs does NOT satisfy the recipe flag."""
    import json as _json

    scales = str(tmp_path / "recipe.json")
    outs = {}
    for tag in ("calib", "restart"):
        out = str(tmp_path / f"det_{tag}")
        rc = main(["detect", "--images", assets["imgs"], "--det", out,
                   "--cfg", assets["cfg"], "--weights", assets["weights"],
                   "--reso", "320", "--int8", "--int8-calib", assets["imgs"],
                   "--int8-recipe", "auto", "--int8-scales", scales,
                   "--save-json"])
        assert rc == 0
        outs[tag] = open(os.path.join(out, "detections.jsonl")).read()
    assert outs["calib"] == outs["restart"]
    saved = _json.load(open(scales))
    assert saved["recipe"] == "auto"
    assert saved["bias_delta"]  # trio includes bias correction
    assert any(isinstance(v, dict) for v in saved["scales"].values())

    # an un-stamped file (explicit knobs) + --int8-recipe -> refuse
    saved.pop("recipe")
    explicit = str(tmp_path / "explicit.json")
    with open(explicit, "w") as f:
        _json.dump(saved, f)
    with pytest.raises(SystemExit, match="already exists"):
        main(["detect", "--images", assets["imgs"],
              "--det", str(tmp_path / "det_err"),
              "--cfg", assets["cfg"], "--weights", assets["weights"],
              "--reso", "320", "--int8", "--int8-calib", assets["imgs"],
              "--int8-recipe", "auto", "--int8-scales", explicit])


def test_int8_recipe_is_calibration_default(assets, tmp_path):
    """Round-4 default: bare --int8-calib applies the recipe (scales file
    stamped 'auto', bias deltas present); --int8-recipe none opts out
    (plain calibration, unstamped file) and the unstamped file reloads on
    restart without a re-calibration error."""
    import json as _json

    scales = str(tmp_path / "default.json")
    rc = main(["detect", "--images", assets["imgs"],
               "--det", str(tmp_path / "det_default"),
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--reso", "320", "--int8", "--int8-calib", assets["imgs"],
               "--int8-scales", scales, "--save-json"])
    assert rc == 0
    saved = _json.load(open(scales))
    assert saved["recipe"] == "auto"
    assert saved["bias_delta"]

    plain = str(tmp_path / "plain.json")
    for tag in ("calib", "restart"):
        rc = main(["detect", "--images", assets["imgs"],
                   "--det", str(tmp_path / f"det_none_{tag}"),
                   "--cfg", assets["cfg"], "--weights", assets["weights"],
                   "--reso", "320", "--int8", "--int8-calib", assets["imgs"],
                   "--int8-recipe", "none", "--int8-scales", plain])
        assert rc == 0
    saved = _json.load(open(plain))
    assert "recipe" not in saved and "bias_delta" not in saved


def test_int8_weights_only_cli(assets, tmp_path):
    """--int8 --int8-weights-only: weight-only quantization from the CLI —
    runs without calibration, refuses the w8a8-only flags."""
    out = str(tmp_path / "det_w8")
    rc = main(["detect", "--images", assets["imgs"], "--det", out,
               "--cfg", assets["cfg"], "--weights", assets["weights"],
               "--reso", "320", "--int8", "--int8-weights-only"])
    assert rc == 0
    assert os.listdir(out)
    with pytest.raises(SystemExit, match="no activation"):
        main(["detect", "--images", assets["imgs"],
              "--det", str(tmp_path / "det_err"),
              "--cfg", assets["cfg"], "--weights", assets["weights"],
              "--reso", "320", "--int8", "--int8-weights-only",
              "--int8-calib", assets["imgs"]])
