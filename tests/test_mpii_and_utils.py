"""MPII dataset + utils (timer, env, logger) tests."""
import numpy as np
import pytest

REF = "/root/reference/tests/data/mpii"


def test_mpii_db_loading():
    from vitpose_tpu.data.mpii import MpiiDataset
    ds = MpiiDataset(f"{REF}/test_mpii.json", REF + "/")
    assert len(ds) > 0
    rec = ds.db[0]
    assert rec['joints_3d'].shape == (16, 3)
    # center/scale conventions applied (padding 1.25, -1 indexing)
    assert rec['scale'][0] > 0


def test_mpii_loader_roundtrip():
    from vitpose_tpu.data.mpii import MpiiDataset
    from vitpose_tpu.data.loader import TopDownLoader
    ds = MpiiDataset(f"{REF}/test_mpii.json", REF + "/")
    loader = TopDownLoader(ds, batch_size=2, is_train=False, num_workers=1)
    b = next(iter(loader))
    assert b['imgs'].shape[0] == 2
    # center must come from the record (scaled by canvas factor)
    rec = ds.db[0]
    np.testing.assert_allclose(
        b['center_orig'][0], rec['center'], atol=1e-3)


def test_stopwatch():
    import time
    from vitpose_tpu.utils.timer import StopWatch
    sw = StopWatch(window=5)
    for _ in range(3):
        with sw.timeit('op'):
            time.sleep(0.01)
    rep = sw.report()
    assert 9 < rep['op'] < 100


def test_collect_env():
    from vitpose_tpu.utils.env import collect_env
    info = collect_env()
    assert 'jax' in info and 'numpy' in info


def test_logger(tmp_path):
    from vitpose_tpu.utils.env import get_root_logger
    log = get_root_logger(log_file=str(tmp_path / 'x.log'),
                          name='vtp_test_logger')
    log.info('hello')
    assert (tmp_path / 'x.log').read_text().strip().endswith('hello')
