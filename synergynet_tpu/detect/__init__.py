"""Face detection: TPU-native FaceBoxes (net, anchors, NMS, pipeline)."""

from synergynet_tpu.detect.net import FaceBoxesNet  # noqa: F401
from synergynet_tpu.detect.anchors import (  # noqa: F401
    generate_anchors, num_anchors, decode_boxes, STEPS, MIN_SIZES, VARIANCES,
)
from synergynet_tpu.detect.nms import (  # noqa: F401
    greedy_nms_mask, nms_indices, pairwise_iou,
)
from synergynet_tpu.detect.detector import (  # noqa: F401
    FaceBoxes, select_detections,
)
from synergynet_tpu.detect.torch_import import (  # noqa: F401
    load_faceboxes_variables, convert_torch_state_dict,
)
from synergynet_tpu.detect.nms import soft_nms, soft_nms_device  # noqa: F401
from synergynet_tpu.detect.train_utils import (  # noqa: F401
    jaccard, encode, match, multibox_loss, center_to_corner,
)
from synergynet_tpu.detect.trainer import (  # noqa: F401
    DetectorTrainer, make_synthetic_detection_batch,
)
