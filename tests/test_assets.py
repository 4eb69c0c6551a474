"""Asset discovery (assets.py): the mAP-parity readiness hook (VERDICT r1 #6)."""

import json
import os

import numpy as np
import pytest

from pytorch_yolo_tpu.assets import (
    EXPECTED_WEIGHTS,
    check_weights_header,
    report_text,
    scan_assets,
)


@pytest.fixture()
def asset_dir(tmp_path):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path / "assets"
    (d / "val2017").mkdir(parents=True)
    rng = np.random.default_rng(0)
    images, anns = [], []
    for i in range(5):
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(d / "val2017" / name),
                    rng.integers(0, 256, (120, 160, 3), dtype=np.uint8))
        images.append({"id": i, "file_name": name, "width": 160, "height": 120})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [10, 10, 50, 50], "iscrowd": 0})
    (d / "instances_val2017.json").write_text(json.dumps(
        {"images": images, "annotations": anns,
         "categories": [{"id": 1, "name": "person"}]}))
    # a realistic-size fake yolov3-tiny.weights with a valid Darknet header
    size = EXPECTED_WEIGHTS["yolov3-tiny.weights"]
    with open(d / "yolov3-tiny.weights", "wb") as f:
        f.write(np.array([0, 2, 0], dtype=np.int32).tobytes())
        f.write(np.array([32], dtype=np.uint64).tobytes())
        f.truncate(size)
    return str(d)


def test_scan_finds_everything(asset_dir):
    report = scan_assets(extra_dirs=[asset_dir])
    assert report.ready
    w = [x for x in report.weights if x.expected_name == "yolov3-tiny.weights"]
    assert w and w[0].header_ok
    assert any(p.endswith("instances_val2017.json") for p in report.annotations)
    assert any(p.endswith("val2017") for p in report.image_dirs)
    text = report_text(report)
    assert "READY" in text and "evaluate" in text


def test_scan_empty_reports_blockage(tmp_path):
    report = scan_assets(extra_dirs=[str(tmp_path)])
    # the global drop points are empty in this container
    assert not report.ready
    text = report_text(report)
    assert "blocked" in text


def test_bad_header_flagged(tmp_path):
    p = tmp_path / "yolov3.weights"
    p.write_bytes(b"\xff" * 100)
    assert not check_weights_header(str(p))


def test_env_var_search(asset_dir, monkeypatch):
    monkeypatch.setenv("PYTORCH_YOLO_ASSETS", asset_dir)
    assert scan_assets().ready


def test_assets_cli(asset_dir, capsys):
    from pytorch_yolo_tpu.cli import main

    rc = main(["assets", asset_dir])
    assert rc == 0
    assert "READY" in capsys.readouterr().out


def test_evaluate_autodiscovers_assets(asset_dir, monkeypatch, capsys):
    """One command runs parity the moment assets appear: evaluate with no
    --images/--annotations discovers them (weights stay synthetic here —
    the fake .weights file is header-valid but truncated zeros, so we pass
    an explicit synthetic-weights model instead of loading it)."""
    monkeypatch.setenv("PYTORCH_YOLO_ASSETS", asset_dir)
    # remove the fake weights so _build_detector doesn't try to parse zeros
    os.rename(os.path.join(asset_dir, "yolov3-tiny.weights"),
              os.path.join(asset_dir, "x.bin"))
    from pytorch_yolo_tpu.cli import main

    rc = main(["evaluate", "--model", "yolov3-tiny", "--reso", "320",
               "--confidence", "0.5"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert metrics["images"] == 5


def test_matched_eval_pair_prefers_same_split(tmp_path):
    """val2014 annotations must not pair with val2017 images (code-review r2)."""
    from pytorch_yolo_tpu.assets import AssetReport

    r = AssetReport(
        weights=[],
        annotations=["/a/instances_val2014.json", "/b/instances_val2017.json"],
        image_dirs=["/b/val2017", "/a/val2014"],
    )
    assert r.matched_eval_pair() == ("/a/instances_val2014.json", "/a/val2014")
    # no split-name match: falls back to shared parent, then [0]s
    r2 = AssetReport(weights=[], annotations=["/x/instances_val2017.json"],
                     image_dirs=["/x/images"])
    assert r2.matched_eval_pair() == ("/x/instances_val2017.json", "/x/images")


def test_expected_weights_sizes_match_zoo_specs():
    """The Scaled-YOLOv4 dialect entries in EXPECTED_WEIGHTS are computed
    from OUR generated specs (assets.py table note) — pin that derivation
    so zoo topology drift can't silently desync the asset scanner."""
    from pytorch_yolo_tpu.assets import EXPECTED_WEIGHTS
    from pytorch_yolo_tpu.models.zoo import model_spec
    from pytorch_yolo_tpu.weights import param_count

    for name in ("yolov4-csp", "yolov4x-mish", "yolov4-p5", "yolov4-p6",
                 "yolov4-p7"):
        expect = EXPECTED_WEIGHTS[name + ".weights"]
        assert 20 + 4 * param_count(model_spec(name)) == expect, name


def test_evaluate_on_mesh_matches_single_device(asset_dir, monkeypatch, capsys):
    """evaluate --devices N chunks full device batches (detect_many) and
    reports the same metrics as the single-device stream path."""
    monkeypatch.setenv("PYTORCH_YOLO_ASSETS", asset_dir)
    os.rename(os.path.join(asset_dir, "yolov3-tiny.weights"),
              os.path.join(asset_dir, "x.bin"))
    from pytorch_yolo_tpu.cli import main

    metrics = {}
    for n in ("1", "4"):
        rc = main(["evaluate", "--model", "yolov3-tiny", "--reso", "320",
                   "--confidence", "0.5", "--devices", n])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        metrics[n] = json.loads(out)
    assert metrics["1"]["images"] == metrics["4"]["images"] == 5
    assert metrics["1"]["mAP@0.5"] == metrics["4"]["mAP@0.5"]
    assert metrics["1"]["AP@[.5:.95]"] == metrics["4"]["AP@[.5:.95]"]
