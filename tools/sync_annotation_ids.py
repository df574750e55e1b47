"""Reconcile annotation image ids between two COCO-style jsons (reference
fork's sync_annotation_ids.py): remap ``target``'s annotation image_ids to
``source``'s ids by matching file_name, fill missing COCO sections from the
source, and assign ids/bboxes to annotations lacking them.

Usage:
    python tools/sync_annotation_ids.py source.json target.json [-o out.json]
"""
import argparse
import json


def sync_annotation_ids(src, tgt, seed=0):
    """Pure function: returns the fixed-up target dict."""
    import numpy as np
    rng = np.random.RandomState(seed)
    if isinstance(tgt, list) or 'annotations' not in tgt:
        tgt = {
            'info': src.get('info', {}),
            'licenses': src.get('licenses', []),
            'images': [],
            'annotations': tgt if isinstance(tgt, list) else [],
        }
    tgt.setdefault('images', [])
    tgt.setdefault('licenses', src.get('licenses', []))
    tgt.setdefault('categories', src.get('categories', []))

    # remap target annotation image_ids to the source's image ids by
    # matching file_name (reference sync_annotation_ids.py:36-42)
    tgt_id_by_name = {im['file_name']: im['id'] for im in tgt['images']}
    src_id_by_name = {im['file_name']: im['id'] for im in src['images']}
    remap = {tgt_id_by_name[n]: src_id_by_name[n]
             for n in tgt_id_by_name if n in src_id_by_name}
    for ann in tgt['annotations']:
        if ann.get('image_id') in remap:
            ann['image_id'] = remap[ann['image_id']]

    used = {a['id'] for a in tgt['annotations'] if 'id' in a}
    for ann in tgt['annotations']:
        if 'id' not in ann:
            new_id = int(rng.randint(0, 100000000))
            while new_id in used:
                new_id = int(rng.randint(0, 100000000))
            used.add(new_id)
            ann['id'] = new_id
        if 'bbox' not in ann:
            ann['bbox'] = [0, 0, 0, 0]
    # adopt the source's image records so downstream COCO loading resolves
    tgt['images'] = src['images']
    return tgt


def main():
    ap = argparse.ArgumentParser(description='Sync annotation ids')
    ap.add_argument('source_file')
    ap.add_argument('target_file')
    ap.add_argument('-o', '--output', default=None,
                    help='output path (default: overwrite target)')
    args = ap.parse_args()
    with open(args.source_file) as f:
        src = json.load(f)
    with open(args.target_file) as f:
        tgt = json.load(f)
    out = sync_annotation_ids(src, tgt)
    with open(args.output or args.target_file, 'w') as f:
        json.dump(out, f)


if __name__ == '__main__':
    main()
