from .geometry import (
    BBox,
    Position,
    bboxes_to_array,
    merge_boxes,
    merge_boxes_batched,
    parse_bbox_predictions,
    parse_bbox_targets,
)
from .metrics import (
    average_precision_50,
    compute_detection_metrics,
    patch_bboxes2full_image,
)

__all__ = [
    "BBox",
    "Position",
    "bboxes_to_array",
    "merge_boxes",
    "merge_boxes_batched",
    "parse_bbox_predictions",
    "parse_bbox_targets",
    "average_precision_50",
    "compute_detection_metrics",
    "patch_bboxes2full_image",
]
