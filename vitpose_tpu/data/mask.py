"""COCO segmentation mask decoding (polygons + RLE), no pycocotools.

Needed by bottom-up training: crowd regions are masked out of the heatmap
loss (reference: bottom_up datasets build `mask` from ann segmentations via
xtcocotools mask utils). Supports:
  * polygon lists -> cv2.fillPoly rasterization,
  * uncompressed RLE ({'counts': [..], 'size': [h, w]}),
  * COCO compressed RLE strings (the LEB128-style ascii encoding).
"""
from __future__ import annotations

from typing import List, Union

import numpy as np


def decode_compressed_rle(s: Union[str, bytes]) -> List[int]:
    """COCO compressed RLE string -> counts list (column-major runs)."""
    if isinstance(s, str):
        s = s.encode()
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
        # sign-extend
        if x & (1 << (5 * k - 1)):
            x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rle_to_mask(counts, size) -> np.ndarray:
    """Column-major run lengths -> [h, w] uint8 mask."""
    h, w = size
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        flat[pos:pos + c] = val
        pos += c
        val = 1 - val
    return flat.reshape(w, h).T                       # column-major


def segmentation_to_mask(segm, height, width) -> np.ndarray:
    """Any COCO segmentation format -> [h, w] uint8 mask."""
    if isinstance(segm, list):                        # polygons
        import cv2
        mask = np.zeros((height, width), np.uint8)
        for poly in segm:
            pts = np.asarray(poly, np.float64).reshape(-1, 2)
            cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
        return mask
    counts = segm['counts']
    if isinstance(counts, (str, bytes)):
        counts = decode_compressed_rle(counts)
    return rle_to_mask(counts, segm['size'])
