"""Load individual reference-implementation files as standalone modules for
golden testing, without installing mmcv/mmpose.

The reference at /root/reference is read-only and its package __init__ pulls
in mmcv; we instead exec single files with their intra-package imports stubbed
so our jnp rewrites can be compared against the genuine original behavior.
"""
import importlib.util
import sys
import types

REF = "/root/reference"


def _load(path, name, pre_modules=()):
    for mod_name, mod in pre_modules:
        sys.modules[mod_name] = mod
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_cache = {}


def ref_post_transforms():
    if "post_transforms" not in _cache:
        _cache["post_transforms"] = _load(
            f"{REF}/mmpose/core/post_processing/post_transforms.py",
            "_ref_post_transforms")
    return _cache["post_transforms"]


def ref_top_down_eval():
    if "top_down_eval" not in _cache:
        pt = ref_post_transforms()
        fake_pkg = types.ModuleType("mmpose.core.post_processing")
        fake_pkg.transform_preds = pt.transform_preds
        fake_root = types.ModuleType("mmpose")
        fake_core = types.ModuleType("mmpose.core")
        _cache["top_down_eval"] = _load(
            f"{REF}/mmpose/core/evaluation/top_down_eval.py",
            "_ref_top_down_eval",
            pre_modules=[
                ("mmpose", fake_root),
                ("mmpose.core", fake_core),
                ("mmpose.core.post_processing", fake_pkg),
            ])
    return _cache["top_down_eval"]


def ref_top_down_transform():
    if "top_down_transform" not in _cache:
        pt = ref_post_transforms()
        fake_pp = types.ModuleType("mmpose.core.post_processing")
        for name in ("affine_transform", "fliplr_joints",
                     "get_affine_transform", "get_warp_matrix",
                     "warp_affine_joints"):
            setattr(fake_pp, name, getattr(pt, name))
        fake_builder = types.ModuleType("mmpose.datasets.builder")

        class _Registry:
            def register_module(self, *a, **k):
                def deco(cls):
                    return cls
                return deco

        fake_builder.PIPELINES = _Registry()
        fake_root = types.ModuleType("mmpose")
        fake_core = types.ModuleType("mmpose.core")
        fake_ds = types.ModuleType("mmpose.datasets")
        _cache["top_down_transform"] = _load(
            f"{REF}/mmpose/datasets/pipelines/top_down_transform.py",
            "_ref_top_down_transform",
            pre_modules=[
                ("mmpose", fake_root),
                ("mmpose.core", fake_core),
                ("mmpose.core.post_processing", fake_pp),
                ("mmpose.datasets", fake_ds),
                ("mmpose.datasets.builder", fake_builder),
            ])
    return _cache["top_down_transform"]


def ref_nms():
    if "nms" not in _cache:
        _cache["nms"] = _load(
            f"{REF}/mmpose/core/post_processing/nms.py", "_ref_nms")
    return _cache["nms"]


# ---------------------------------------------------------------------------
# torch model loaders (reference ViT backbone + heads), with stubs for
# timm / mmcv / intra-package imports.
# ---------------------------------------------------------------------------

def _stub_timm():
    import torch
    import torch.nn.functional  # noqa: F401
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        return torch.nn.init.trunc_normal_(tensor, std=std)

    def drop_path(x, drop_prob=0.0, training=False):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        mask.floor_()
        return x.div(keep) * mask

    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.drop_path = drop_path
    models.layers = layers
    timm.models = models
    return [("timm", timm), ("timm.models", models),
            ("timm.models.layers", layers)]


def _stub_mm_for_models():
    import torch.nn as nn
    import torch.nn.functional as F

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    builder = types.ModuleType("mmpose.models.builder")
    builder.BACKBONES = _Registry()
    builder.HEADS = _Registry()
    builder.build_loss = lambda cfg: None

    base_backbone = types.ModuleType(
        "mmpose.models.backbones.base_backbone")

    class BaseBackbone(nn.Module):
        def init_weights(self, pretrained=None, **kw):
            pass

    base_backbone.BaseBackbone = BaseBackbone

    mmcv_cnn = types.ModuleType("mmcv.cnn")

    def build_conv_layer(cfg, *args, **kw):
        return nn.Conv2d(*args, **kw)

    def build_norm_layer(cfg, num_features):
        return "bn", nn.BatchNorm2d(num_features)

    def build_upsample_layer(cfg, **kw):
        kw.pop("type", None)
        return nn.ConvTranspose2d(**kw)

    mmcv_cnn.build_conv_layer = build_conv_layer
    mmcv_cnn.build_norm_layer = build_norm_layer
    mmcv_cnn.build_upsample_layer = build_upsample_layer
    mmcv_cnn.constant_init = lambda m, v, **k: None
    mmcv_cnn.normal_init = lambda m, **k: None
    mmcv = types.ModuleType("mmcv")
    mmcv.cnn = mmcv_cnn

    ops = types.ModuleType("mmpose.models.utils.ops")

    def resize(input=None, size=None, scale_factor=None, mode="nearest",
               align_corners=None, warning=True):
        return F.interpolate(input, size=size, scale_factor=scale_factor,
                             mode=mode, align_corners=align_corners)

    ops.resize = resize

    tde = ref_top_down_eval()
    evaluation = types.ModuleType("mmpose.core.evaluation")
    evaluation.pose_pck_accuracy = tde.pose_pck_accuracy
    pt = ref_post_transforms()
    post_processing = types.ModuleType("mmpose.core.post_processing")
    post_processing.flip_back = pt.flip_back

    mods = [
        ("mmpose", types.ModuleType("mmpose")),
        ("mmpose.models", types.ModuleType("mmpose.models")),
        ("mmpose.models.builder", builder),
        ("mmpose.models.backbones", types.ModuleType("mmpose.models.backbones")),
        ("mmpose.models.backbones.base_backbone", base_backbone),
        ("mmpose.models.utils", types.ModuleType("mmpose.models.utils")),
        ("mmpose.models.utils.ops", ops),
        ("mmpose.core", types.ModuleType("mmpose.core")),
        ("mmpose.core.evaluation", evaluation),
        ("mmpose.core.post_processing", post_processing),
        ("mmcv", mmcv),
        ("mmcv.cnn", mmcv_cnn),
    ]
    return mods + _stub_timm()


def ref_vit():
    if "vit" not in _cache:
        # load under its real dotted name so `from ..builder import ...`
        # resolves against the stub package tree
        _cache["vit"] = _load(
            f"{REF}/mmpose/models/backbones/vit.py",
            "mmpose.models.backbones.vit",
            pre_modules=_stub_mm_for_models())
    return _cache["vit"]


def ref_vit_moe():
    if "vit_moe" not in _cache:
        _cache["vit_moe"] = _load(
            f"{REF}/mmpose/models/backbones/vit_moe.py",
            "mmpose.models.backbones.vit_moe",
            pre_modules=_stub_mm_for_models())
    return _cache["vit_moe"]


def ref_simple_head():
    if "simple_head" not in _cache:
        mods = _stub_mm_for_models()
        heads_pkg = types.ModuleType("mmpose.models.heads")
        mods = mods + [("mmpose.models.heads", heads_pkg)]
        base = _load(
            f"{REF}/mmpose/models/heads/topdown_heatmap_base_head.py",
            "mmpose.models.heads.topdown_heatmap_base_head",
            pre_modules=mods + [
                ("mmpose.core.evaluation.top_down_eval",
                 sys.modules["_ref_top_down_eval"]),
            ])
        _cache["simple_head"] = _load(
            f"{REF}/mmpose/models/heads/topdown_heatmap_simple_head.py",
            "mmpose.models.heads.topdown_heatmap_simple_head",
            pre_modules=mods)
    return _cache["simple_head"]
