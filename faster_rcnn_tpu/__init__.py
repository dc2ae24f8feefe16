"""TPU-native Faster R-CNN framework (JAX/Flax/XLA/Pallas rebuild of
Kelicious/faster_rcnn).

Library facade — the reference has none (its public API is 8 CLI scripts,
SURVEY.md §1); this package is importable:

    from faster_rcnn_tpu import FasterRcnnConfig, voc_config, kitti_config
    from faster_rcnn_tpu.models.detector import FasterRCNN, init_model
    from faster_rcnn_tpu.inference import make_detect_fn
    from faster_rcnn_tpu.train.trainer import run_four_step_training

Heavy modules (models, train, inference) are imported lazily by their own
paths so that `import faster_rcnn_tpu` stays light.
"""

from faster_rcnn_tpu.config import (  # noqa: F401
    AnchorConfig,
    DataConfig,
    DetConfig,
    FasterRcnnConfig,
    ModelConfig,
    RpnConfig,
    TrainConfig,
    kitti_config,
    voc_config,
)

__version__ = "0.1.0"
