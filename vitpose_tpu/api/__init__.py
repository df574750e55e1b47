"""Public API surface — mirrors the reference `mmpose.apis` exports
(reference mmpose/apis/__init__.py). `run_validation` / `collect_results`
are the single_gpu_test / multi_gpu_test+collect_results_cpu
counterparts (eval/loop.py); `train_model` lives in train/loop.py."""
from .inference import (init_pose_model, inference_top_down_pose_model,
                        inference_bottom_up_pose_model, vis_pose_result,
                        process_mmdet_results)
from .inference_3d import (extract_pose_sequence,
                           inference_pose_lifter_model,
                           inference_interhand_3d_model,
                           inference_mesh_model,
                           vis_3d_pose_result, vis_3d_mesh_result)
from .tracking import get_track_id, vis_pose_tracking_result
from ..eval.loop import run_validation, collect_results
from ..parallel.distributed import init_random_seed
from ..train.loop import train_model

__all__ = [
    'train_model', 'init_pose_model', 'inference_top_down_pose_model',
    'inference_bottom_up_pose_model', 'run_validation', 'collect_results',
    'vis_pose_result', 'get_track_id', 'vis_pose_tracking_result',
    'inference_pose_lifter_model', 'vis_3d_pose_result',
    'inference_interhand_3d_model', 'extract_pose_sequence',
    'inference_mesh_model', 'vis_3d_mesh_result', 'process_mmdet_results',
    'init_random_seed',
]
