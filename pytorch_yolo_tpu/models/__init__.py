from .darknet import build_forward, head_shapes
from .zoo import available_models, model_spec, write_cfg, yolov3_cfg, yolov3_tiny_cfg

__all__ = [
    "build_forward",
    "head_shapes",
    "available_models",
    "model_spec",
    "write_cfg",
    "yolov3_cfg",
    "yolov3_tiny_cfg",
]
