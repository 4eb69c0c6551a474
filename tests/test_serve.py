"""HTTP serving layer (serve.py): endpoints, micro-batching, parity."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import pytorch_yolo_tpu as pyt
from pytorch_yolo_tpu.serve import make_server, _pow2_bucket

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def server():
    det = pyt.Detector.load("yolov3-tiny")
    srv = make_server(det, port=0, size=320, conf=0.5, batch_max=4,
                      batch_timeout_ms=20.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, det
    srv.batcher.close()
    srv.shutdown()


def _url(srv, path):
    host, port = srv.server_address[:2]
    return f"http://{host}:{port}{path}"


def _img(seed=0, h=240, w=320):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


def _post_image(srv, img):
    ok, buf = cv2.imencode(".png", img)  # png: lossless, exact parity below
    assert ok
    req = urllib.request.Request(_url(srv, "/detect"), data=buf.tobytes(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_pow2_bucket():
    assert [_pow2_bucket(n, 8) for n in (1, 2, 3, 5, 8, 9)] == [1, 2, 4, 8, 8, 8]
    assert _pow2_bucket(5, 6) == 6


def test_healthz_and_stats(server):
    srv, _ = server
    with urllib.request.urlopen(_url(srv, "/healthz"), timeout=30) as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["status"] == "ok" and body["classes"] == 80
    with urllib.request.urlopen(_url(srv, "/stats"), timeout=30) as r:
        assert "throughput_per_s" in json.loads(r.read())


def test_detect_roundtrip_matches_library(server):
    srv, det = server
    img = _img(1)
    status, body = _post_image(srv, img)
    assert status == 200
    local = det.detect_many([img], size=320, conf=0.5, transfer="u8")[0]
    assert len(body["boxes"]) == len(local)
    np.testing.assert_allclose(np.asarray(body["boxes"]), local.boxes,
                               rtol=1e-4, atol=1e-2)
    assert body["names"][0] in det.class_names


def test_concurrent_requests_batch(server):
    srv, _ = server
    results = [None] * 6

    def hit(i):
        results[i] = _post_image(srv, _img(seed=10 + i, h=200 + 10 * i, w=300))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert all(r is not None and r[0] == 200 for r in results)
    # distinct images of distinct sizes: responses must not be mixed up
    sigs = {tuple(np.round(r[1]["boxes"][0], 2)) for r in results if r[1]["boxes"]}
    assert len(sigs) >= 2


def test_error_paths(server):
    srv, _ = server
    # empty body
    req = urllib.request.Request(_url(srv, "/detect"), data=b"", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # undecodable bytes
    req = urllib.request.Request(_url(srv, "/detect"), data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400 and "decode" in json.loads(e.value.read())["error"]
    # unknown routes
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(_url(srv, "/nope"), timeout=30)
    assert e.value.code == 404
    # oversized Content-Length is rejected with 413 BEFORE the body is read
    from pytorch_yolo_tpu.serve import MAX_BODY_BYTES

    req = urllib.request.Request(_url(srv, "/detect"), data=b"x", method="POST",
                                 headers={"Content-Length": str(MAX_BODY_BYTES + 1)})
    with pytest.raises((urllib.error.HTTPError, ConnectionError, OSError)) as e:
        urllib.request.urlopen(req, timeout=30)
    if isinstance(e.value, urllib.error.HTTPError):
        assert e.value.code == 413


def test_serve_on_mesh_buckets_divide_mesh():
    """A mesh-bound detector forces the micro-batch bucket floor to the
    mesh size (GSPMD divisibility) and still answers requests correctly."""
    import jax

    from pytorch_yolo_tpu.parallel.sharding import make_batch_mesh

    det = pyt.Detector.load("yolov3-tiny",
                            mesh=make_batch_mesh(jax.devices()[:4]))
    srv = make_server(det, port=0, size=320, conf=0.5, batch_max=6,
                      batch_timeout_ms=10.0)
    try:
        assert srv.batcher.bucket_floor == 4
        assert srv.batcher.batch_max == 8  # 6 rounded up to a mesh multiple
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        status, body = _post_image(srv, _img(3))
        assert status == 200
        # parity with the library call on the same mesh detector
        lib = det.detect_many([_img(3)], size=320, conf=0.5,
                              transfer="u8")[0]
        assert len(body["boxes"]) == len(lib)
        np.testing.assert_allclose(np.asarray(body["boxes"]), lib.boxes,
                                   rtol=1e-4, atol=1e-2)
    finally:
        srv.batcher.close()
        srv.shutdown()


def test_mesh_bucket_math_non_pow2_mesh():
    """Buckets on a 3-device mesh are always multiples of 3 (GSPMD) and
    the warmup ladder is exactly the dispatchable set."""
    from pytorch_yolo_tpu.serve import _mesh_bucket, bucket_ladder

    cap = 9  # batch_max already rounded to a floor multiple
    for n in range(1, cap + 1):
        b = _mesh_bucket(n, cap, 3)
        assert b % 3 == 0 and n <= b <= cap, (n, b)
    assert bucket_ladder(cap, 3) == [3, 6, 9]
    assert bucket_ladder(8, 1) == [1, 2, 4, 8]
