"""``python -m pytorch_yolo_tpu`` == the ``pytorch-yolo-tpu`` console script."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
