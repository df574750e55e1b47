#!/usr/bin/env python
"""Convert an MPII prediction .mat file to json (counterpart of the
reference's tools/dataset/mat2json.py:28-51): replaces each ground-truth
record's `joints` with the predicted coordinates and drops `joints_vis`.

Usage:
    python tools/dataset/mat2json.py pred.mat gt.json out.json
"""
import argparse
import json
import time

import numpy as np


def convert_mat(pred_mat_file, gt_json_file, output_json_file=None):
    from scipy.io import loadmat
    preds = np.asarray(loadmat(pred_mat_file)['preds'])
    with open(gt_json_file) as f:
        records = json.load(f)
    if len(records) != len(preds):
        raise ValueError(
            f'{len(preds)} predictions vs {len(records)} GT records')
    for rec, pred in zip(records, preds):
        rec.pop('joints_vis', None)
        rec['joints'] = np.asarray(pred, np.float64).tolist()
    out = {
        'annotations': records,
        'info': {
            'description': 'Converted MPII prediction.',
            'year': time.strftime('%Y', time.localtime()),
            'date_created': time.strftime('%Y/%m/%d', time.localtime()),
        },
    }
    if output_json_file:
        with open(output_json_file, 'w') as f:
            json.dump(out, f, indent=4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('pred_mat_file')
    ap.add_argument('gt_json_file')
    ap.add_argument('output_json_file')
    args = ap.parse_args()
    convert_mat(args.pred_mat_file, args.gt_json_file, args.output_json_file)


if __name__ == '__main__':
    main()
