#!/usr/bin/env python
"""Standalone COCO keypoint evaluation of a result json against a GT json
(counterpart of the fork's eval_detector.py, without xtcocotools).

Usage: python tools/eval_detector.py GT.json RESULTS.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('gt')
    ap.add_argument('results')
    args = ap.parse_args()
    from vitpose_tpu.data import CocoIndex
    from vitpose_tpu.eval import CocoKeypointEval
    from vitpose_tpu.data.dataset_info import DatasetInfo
    gt = CocoIndex(args.gt)
    dt = gt.loadRes(args.results)
    sigmas = DatasetInfo.load('coco').sigmas
    k = len(gt.loadAnns(gt.getAnnIds())[0].get('keypoints', [])) // 3 \
        if gt.dataset.get('annotations') else 17
    stats = CocoKeypointEval(
        gt, sigmas=sigmas if k == 17 else None).evaluate(dt)
    print(json.dumps({name: round(float(v), 4)
                      for name, v in stats.items()}, indent=2))


if __name__ == '__main__':
    main()
