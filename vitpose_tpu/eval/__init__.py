from .cocoeval import CocoKeypointEval, COCO_KPT_STAT_NAMES
