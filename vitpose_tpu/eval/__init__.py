from .cocoeval import CocoKeypointEval, COCO_KPT_STAT_NAMES
from .families import (evaluate_interhand3d, evaluate_mesh,
                       evaluate_pose_lifter, evaluate_posewarper,
                       evaluate_voxelpose)

__all__ = [
    'CocoKeypointEval', 'COCO_KPT_STAT_NAMES', 'evaluate_interhand3d',
    'evaluate_mesh', 'evaluate_pose_lifter', 'evaluate_posewarper',
    'evaluate_voxelpose',
]
