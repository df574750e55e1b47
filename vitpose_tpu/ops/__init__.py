from .geometry import (
    bbox_xywh2cs,
    bbox_xyxy2xywh,
    bbox_cs2xyxy,
    affine_matrix,
    invert_affine,
    udp_warp_matrix,
    apply_affine_to_points,
    transform_preds,
    fliplr_joints,
    fliplr_regression,
    flip_back,
    flip_index_from_pairs,
)
from .smoothing import OneEuroFilter
from .target import generate_msra_heatmaps, generate_udp_heatmaps, generate_combined_target
from .decode import (keypoints_from_heatmaps, heatmaps_to_coords,
                     pose_pck_accuracy, keypoints_from_regression,
                     multilabel_classification_accuracy)
from .warp import warp_affine_batch
from .nms import oks_iou, oks_nms, soft_oks_nms
