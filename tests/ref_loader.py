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
