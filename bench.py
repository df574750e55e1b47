"""Benchmark: end-to-end ViTPose-B 256x192 inference throughput per chip.

Headline metric: sustained throughput of the full deployed single-forward
path — uint8 input, imagenet normalization (folded into the patch-embed
conv), ViT-B forward (bf16, blocked Pallas attention, tanh GELU), classic
deconv head, and on-device UDP decode to keypoints — at batch 256 on one
TPU chip, with GROUP batches processed per dispatch (lax.scan) the way a
deployed serving loop keeps the device fed. This matches the reference's
A100 TensorRT measurement conditions (single forward, no flip test;
arXiv:2204.12484 throughput figure, ~944 img/s for ViTPose-B):
vs_baseline = ours / 944.

Serving-time math notes (both also standard in TensorRT deployments):
  * GELU uses the tanh approximation (erf GELU costs ~14% end-to-end on
    v5e; TensorRT's GELU kernels use the same tanh form).
  * The uint8 /255 + imagenet mean/std normalization is folded into the
    patch-embed convolution weights (exact algebraic rewrite).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

A100_BASELINE_IMGS_PER_SEC = 944.0
BATCH = 256
GROUP = int(os.environ.get('BENCH_GROUP', '16'))  # batches per dispatch
WARMUP = 1                      # (amortizes host/tunnel latency)
ITERS = int(os.environ.get('BENCH_ITERS', '5'))


def fold_normalization(variables, mean, std):
    """Fold x' = (x/255 - mean)/std into the patch-embed conv (exact):
    conv(W, x') + b == conv(W/(255*std), x) + (b - sum_hw W @ (mean/std))."""
    import jax.numpy as jnp
    import numpy as np
    params = variables['params']
    pe = dict(params['backbone']['patch_embed'])
    w = np.asarray(pe['kernel'], np.float32)          # [kh, kw, 3, D]
    b = np.asarray(pe['bias'], np.float32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    w_new = w / (255.0 * std)[None, None, :, None]
    b_new = b + np.einsum('hwcd,c->d', w, -mean / std)
    pe['kernel'] = jnp.asarray(w_new, np.asarray(pe['kernel']).dtype)
    pe['bias'] = jnp.asarray(b_new, np.asarray(pe['bias']).dtype)
    backbone = dict(params['backbone'])
    backbone['patch_embed'] = pe
    params = dict(params)
    params['backbone'] = backbone
    out = dict(variables)
    out['params'] = params
    return out


def main():
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np
    from vitpose_tpu.models import TopDownModel, make_config
    from vitpose_tpu.ops.decode import keypoints_from_heatmaps
    from vitpose_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    cfg = make_config('b', img_size=(256, 192), out_channels=17,
                      dtype='bfloat16')
    cfg = dc.replace(cfg, backbone=dc.replace(cfg.backbone,
                                              fused_attention=True,
                                              gelu_approx=True))
    model = TopDownModel(cfg)
    # BENCH_INT8=1: W8A8 MLP with calibrated static scales (the TensorRT
    # int8-calibration counterpart; see utils/quantize.py). Measured
    # 2819 img/s (2.99x baseline) vs 2499 bf16 on v5e; kept off the
    # headline so the recorded number stays comparable to the fp16
    # TensorRT baseline conditions.
    int8 = os.environ.get('BENCH_INT8', '0') == '1'
    # BENCH_INT8_QKV=1: additionally quantize the attention qkv/proj
    # projections (the remaining 1/3 of block matmul FLOPs).
    int8_qkv = os.environ.get('BENCH_INT8_QKV', '0') == '1'
    int8 = int8 or int8_qkv
    rng = jax.random.PRNGKey(0)
    # distinct inputs per timed iteration: the remote-execution path can
    # dedupe identical dispatches, which silently breaks the timing
    batches = [
        jax.random.randint(jax.random.PRNGKey(i),
                           (GROUP, BATCH, 256, 192, 3),
                           0, 255, dtype=jnp.int32).astype(jnp.uint8)
        for i in range(WARMUP + ITERS)
    ]
    center = jnp.tile(jnp.asarray([[320.0, 240.0]]), (BATCH, 1))
    scale = jnp.tile(jnp.asarray([[1.2, 1.6]]), (BATCH, 1))
    variables = model.init(rng, jnp.zeros((1, 256, 192, 3)))
    variables = fold_normalization(variables, IMAGENET_MEAN, IMAGENET_STD)
    if int8:
        from vitpose_tpu.utils.quantize import (calibrate_act_scales,
                                                int8_serving_config)
        cal = [np.asarray(batches[0][0, :8], np.float32)]
        scales = calibrate_act_scales(model, variables, cal, attn=int8_qkv)
        model = TopDownModel(int8_serving_config(cfg, scales, qkv=int8_qkv))

    @jax.jit
    def end_to_end(variables, imgs8_group):
        def body(carry, imgs8):
            x = imgs8.astype(jnp.float32)     # normalization lives in the
            hm = model.apply(variables, x, train=False)  # patch-embed conv
            preds, maxvals = keypoints_from_heatmaps(
                hm, center, scale, post_process='default', use_udp=True)
            return carry, (preds, maxvals)
        _, outs = jax.lax.scan(body, 0, imgs8_group)
        return outs

    def sync(x):
        # block_until_ready is not a reliable barrier on the remote-tunnel
        # backend; a tiny host readback is.
        return float(np.asarray(x)[0, 0, 0, 0])

    for b in range(WARMUP):
        preds, _ = end_to_end(variables, batches[b])
        sync(preds)

    # median per-dispatch time: robust to occasional multi-ms hiccups of
    # the sandbox tunnel, which otherwise drag a total-time measurement
    times = []
    for b in range(WARMUP, WARMUP + ITERS):
        t0 = time.perf_counter()
        preds, _ = end_to_end(variables, batches[b])
        sync(preds)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    imgs_per_sec = GROUP * BATCH / dt
    print(json.dumps({
        "metric": ("vitpose_b_256x192_e2e_infer"
                   + ("_int8" if int8 else "")
                   + ("_qkv" if int8_qkv else "")),
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / A100_BASELINE_IMGS_PER_SEC, 4),
    }))


if __name__ == '__main__':
    main()
