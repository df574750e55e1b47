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


def test_train_model_routes_mpii_dataset(tmp_path):
    """train_model must build the MPII list-format dataset class from
    data.dataset (review finding: it always built the COCO-format
    TopDownDataset, so MPII training crashed at json load)."""
    from vitpose_tpu.train.loop import train_model

    cfg = {
        'model': dict(variant='s', img_size=(64, 64), out_channels=16,
                      backbone_overrides=dict(embed_dim=32, depth=1,
                                              num_heads=4),
                      deconv_filters=(16, 16), deconv_kernels=(4, 4),
                      flip_test=False, use_udp=False),
        'data': dict(dataset='mpii', image_size=(64, 64),
                     heatmap_size=(16, 16), batch_size=2, num_workers=1,
                     canvas_size=640,
                     train=dict(ann_file=f"{REF}/test_mpii.json",
                                img_prefix=REF + "/"),
                     aug=dict(flip_prob=0.0, half_body_prob=0.0,
                              scale_factor=0.0, rot_prob=0.0)),
        'target': dict(encoding='MSRA', sigma=2.0),
        'optimizer': dict(base_lr=1e-4, warmup_iters=1, total_epochs=1),
        'runtime': dict(work_dir=str(tmp_path), log_interval=1,
                        eval_interval=0, ckpt_interval=0),
    }
    train_model(cfg)
    assert (tmp_path / 'train.log.json').exists()
