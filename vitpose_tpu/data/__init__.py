from .dataset_info import DatasetInfo, available_datasets
from .coco_index import CocoIndex
from .topdown import TopDownDataset
from .wholebody import WholeBodyDataset
from .loader import TopDownLoader
from .posetrack import PoseTrackDataset
from .jhmdb import JhmdbDataset
