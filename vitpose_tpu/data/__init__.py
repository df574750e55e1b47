from .dataset_info import DatasetInfo, available_datasets
from .coco_index import CocoIndex
from .topdown import TopDownDataset
from .wholebody import WholeBodyDataset
from .loader import TopDownLoader
from .posetrack import PoseTrackDataset
from .jhmdb import JhmdbDataset


def topdown_dataset_cls(name):
    """Dataset-name -> top-down dataset class (the registry tools/test.py
    and the training loop share; counterpart of the reference DATASETS
    registry dispatch). Non-COCO-format protocols (MPII list jsons,
    PoseTrack sequences, ...) need their own classes."""
    if name in ('mpii', 'mpii_trb'):
        from .mpii import MpiiDataset, MpiiTrbDataset
        return MpiiDataset if name == 'mpii' else MpiiTrbDataset
    return {'coco_wholebody': WholeBodyDataset,
            'posetrack18': PoseTrackDataset,
            'jhmdb': JhmdbDataset}.get(name, TopDownDataset)
