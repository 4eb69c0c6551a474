"""pytorch_yolo_tpu — a TPU-native YOLO (Darknet) inference framework in JAX.

Brand-new rebuild of the capabilities of ``Dipet/pytorch_yolo`` (see
SURVEY.md): Darknet ``.cfg``/``.weights`` in, boxes+scores+classes out, with
the compute path designed for TPU — pure-functional XLA-compiled forward,
fused on-device letterbox, fixed-shape NMS, and batch sharding over a device
mesh.
"""

def _honor_jax_platforms_env() -> None:
    """Re-assert the standard ``JAX_PLATFORMS`` env var over container
    sitecustomize hooks that force-register a TPU plugin by writing
    ``jax.config`` directly (observed: env-var-only pinning still
    initializes the tunnel backend, which hangs/fails during grant
    outages).  No-op unless the user explicitly set the variable."""
    import os as _os

    want = _os.environ.get("JAX_PLATFORMS", "").strip()
    if want:
        import jax as _jax

        try:
            _jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass  # backend already initialized; nothing to re-assert


_honor_jax_platforms_env()

from .api import Detection, Detector, detect, load
from .config import ModelSpec, load_model_spec, parse_cfg_file, parse_cfg_text, build_spec
from .models.zoo import available_models, model_spec, write_cfg
from .utils.compile_cache import enable_compilation_cache
from .weights import load_weights, write_weights_file, fold_batchnorm, random_raw_params

__version__ = "0.1.0"

__all__ = [
    "Detection",
    "Detector",
    "detect",
    "load",
    "ModelSpec",
    "load_model_spec",
    "parse_cfg_file",
    "parse_cfg_text",
    "build_spec",
    "available_models",
    "model_spec",
    "write_cfg",
    "load_weights",
    "write_weights_file",
    "fold_batchnorm",
    "random_raw_params",
    "enable_compilation_cache",
    "__version__",
]
