from .inference import (init_pose_model, inference_top_down_pose_model,
                        vis_pose_result, process_mmdet_results)
