from .names import COCO_NAMES, load_classes
from .palette import class_colors
from .profiling import PipelineStats, StageStats

__all__ = ["COCO_NAMES", "load_classes", "class_colors", "PipelineStats", "StageStats"]
