"""Native C++ weights loader parity vs the numpy path (SURVEY.md §4.2.2)."""

import numpy as np
import pytest

from pytorch_yolo_tpu.models.zoo import model_spec
from pytorch_yolo_tpu.native import ensure_built, load_library
from pytorch_yolo_tpu.weights import (
    WeightsError,
    fold_batchnorm,
    load_weights,
    load_weights_native,
    random_raw_params,
    read_weights_file,
    write_weights_file,
)

pytestmark = pytest.mark.skipif(
    ensure_built() is None, reason="no C++ toolchain available")


@pytest.fixture(scope="module")
def tiny_file(tmp_path_factory):
    spec = model_spec("yolov3-tiny")
    raw = random_raw_params(spec, seed=21)
    path = str(tmp_path_factory.mktemp("nat") / "tiny.weights")
    write_weights_file(spec, raw, path, seen=777)
    return spec, raw, path


def test_native_matches_numpy_fold(tiny_file):
    spec, raw, path = tiny_file
    native = load_weights_native(spec, path)
    assert native is not None
    numpy_fold = fold_batchnorm(spec, read_weights_file(spec, path))
    assert set(native) == set(numpy_fold)
    for idx in native:
        np.testing.assert_allclose(native[idx]["w"], numpy_fold[idx]["w"],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(native[idx]["b"], numpy_fold[idx]["b"],
                                   rtol=1e-6, atol=1e-7)


def test_load_weights_auto_native(tiny_file):
    spec, _, path = tiny_file
    auto = load_weights(spec, path)          # native fast path
    forced_np = load_weights(spec, path, native=False)
    for idx in auto:
        np.testing.assert_allclose(auto[idx]["w"], forced_np[idx]["w"],
                                   rtol=1e-6, atol=1e-7)


def test_native_rejects_truncated(tiny_file, tmp_path):
    spec, _, path = tiny_file
    with open(path, "rb") as f:
        data = f.read()
    bad = str(tmp_path / "trunc.weights")
    with open(bad, "wb") as f:
        f.write(data[:-8])
    with pytest.raises(WeightsError, match="size"):
        load_weights_native(spec, bad)


def test_native_rejects_missing(tiny_file):
    spec, _, _ = tiny_file
    with pytest.raises(WeightsError, match="open|size"):
        load_weights_native(spec, "/nonexistent/x.weights")


def test_probe(tiny_file):
    import ctypes

    spec, _, path = tiny_file
    lib = load_library()
    hb = ctypes.c_int64()
    bf = ctypes.c_int64()
    seen = ctypes.c_uint64()
    rc = lib.pyt_probe(path.encode(), ctypes.byref(hb), ctypes.byref(bf),
                       ctypes.byref(seen))
    assert rc == 0
    assert hb.value == 20  # v0.2 header
    assert seen.value == 777
    from pytorch_yolo_tpu.weights import param_count

    assert bf.value == param_count(spec)
