"""C++ jpeg decode pool vs the python/cv2 canvas path (csrc/loader.cpp,
data/native.py) — previously only exercised implicitly via the loader."""
import glob

import numpy as np
import pytest

REF = "/root/reference/tests/data/coco"


def test_native_decode_matches_cv2_canvas():
    from vitpose_tpu.data.native import native_available, \
        decode_batch_native
    if not native_available():
        pytest.skip('libvtp_loader.so not built')
    import cv2
    paths = sorted(glob.glob(f'{REF}/*.jpg'))[:3]
    assert paths
    S = 320
    canvases, scales = decode_batch_native(paths, S, n_threads=2)
    assert canvases.shape == (len(paths), S, S, 3)
    for i, p in enumerate(paths):
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        f = min(1.0, S / max(img.shape[:2]))
        nh = int(round(img.shape[0] * f))
        nw = int(round(img.shape[1] * f))
        ref = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        got = canvases[i, :nh, :nw]
        assert abs(scales[i] - f) < 1e-3
        # libjpeg DCT prescale + bilinear differs slightly from cv2's
        # full-decode + resize; require close agreement, not bit equality
        diff = np.abs(got.astype(np.int16) - ref.astype(np.int16))
        assert float(diff.mean()) < 8.0, float(diff.mean())
        # area outside the image stays zero (row nh may straddle the
        # image edge under the decoder's rounding; check from nh+1, and
        # only when that slice is non-empty)
        if nh + 1 < S:
            assert canvases[i, nh + 1:].max() == 0


def test_loader_uses_native_when_available(tmp_path):
    from vitpose_tpu.data import TopDownDataset
    from vitpose_tpu.data.loader import TopDownLoader
    from vitpose_tpu.data.native import native_available
    if not native_available():
        pytest.skip('libvtp_loader.so not built')
    ds = TopDownDataset(f'{REF}/test_coco.json', REF + '/',
                        dataset_info='coco', test_mode=True,
                        use_gt_bbox=True)
    loader = TopDownLoader(ds, 4, is_train=False, num_workers=1)
    assert loader.use_native
    batch = next(iter(loader))
    assert batch['imgs'].dtype == np.uint8
    assert np.isfinite(batch['center']).all()
