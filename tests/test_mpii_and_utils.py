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


def test_weight_norm_clip():
    """weight_norm_clip matches the reference WeightNormClipHook math."""
    import numpy as np
    import jax.numpy as jnp
    from vitpose_tpu.train.optim import weight_norm_clip
    rng = np.random.RandomState(0)
    params = {'conv': {'kernel': jnp.asarray(rng.randn(3, 3, 8, 8) * 2,
                                             jnp.float32),
                       'bias': jnp.asarray(rng.randn(8), jnp.float32)},
              'small': {'kernel': jnp.asarray(rng.randn(2, 2) * 1e-3,
                                              jnp.float32)}}
    out = weight_norm_clip(params, max_norm=1.0)
    n = float(np.linalg.norm(np.asarray(out['conv']['kernel'])))
    assert abs(n - 1.0) < 1e-3, n
    m = float(np.linalg.norm(np.asarray(params['conv']['kernel'])))
    np.testing.assert_allclose(
        np.asarray(out['conv']['kernel']),
        np.asarray(params['conv']['kernel']) * (1.0 / (m + 1e-6)), rtol=1e-5)
    # untouched: bias and under-norm kernels
    np.testing.assert_array_equal(np.asarray(out['conv']['bias']),
                                  np.asarray(params['conv']['bias']))
    np.testing.assert_array_equal(np.asarray(out['small']['kernel']),
                                  np.asarray(params['small']['kernel']))
