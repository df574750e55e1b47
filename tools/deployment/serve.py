#!/usr/bin/env python
"""Minimal HTTP pose-inference server (counterpart of reference
tools/deployment/mmpose2torchserve.py + mmpose_handler.py — a servable
endpoint over the same inference API).

POST /predict with a JSON body:
  {"image": "<base64 jpeg/png>", "bboxes": [[x, y, w, h, score], ...]}
returns {"pose_results": [{"bbox": [...], "keypoints": [[x, y, s] x K]}]}.
GET /health returns model metadata.

Usage:
  python tools/deployment/serve.py [--variant b] [--checkpoint x.pth]
      [--port 8080]
"""
import argparse
import base64
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def make_handler(model):
    import cv2
    import numpy as np
    from vitpose_tpu.api import inference_top_down_pose_model

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == '/health':
                ih, iw = model.cfg.backbone.img_size
                self._json(200, {
                    'status': 'ok',
                    'model': 'vitpose_tpu',
                    'input_size': [ih, iw],
                    'num_joints': model.cfg.out_channels,
                    'dataset': model.dataset_info.dataset_name,
                })
            else:
                self._json(404, {'error': 'not found'})

        def do_POST(self):
            if self.path != '/predict':
                self._json(404, {'error': 'not found'})
                return
            try:
                length = int(self.headers.get('Content-Length', 0))
                req = json.loads(self.rfile.read(length))
                raw = base64.b64decode(req['image'])
                img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                                   cv2.IMREAD_COLOR)
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                person_results = ([{'bbox': np.asarray(b, np.float32)}
                                   for b in req.get('bboxes', [])]
                                  or None)
                results, _ = inference_top_down_pose_model(
                    model, img, person_results)
                out = [{'bbox': np.asarray(r.get('bbox', [])).tolist(),
                        'keypoints': np.asarray(r['keypoints']).tolist()}
                       for r in results]
                self._json(200, {'pose_results': out})
            except Exception as e:                      # noqa: BLE001
                self._json(400, {'error': str(e)})

    return Handler


def _calibration_batches(calib_dir, ih, iw, n=16):
    """Representative inputs for int8 activation calibration: normalized
    real images from --calib-dir when given, else uniform [0,1] synthetic
    images pushed through the SAME imagenet normalization the serving path
    uses (N(0,1) noise would mis-estimate real activation ranges)."""
    import numpy as np
    from vitpose_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    def norm(x01):
        return ((x01 - np.asarray(IMAGENET_MEAN, np.float32))
                / np.asarray(IMAGENET_STD, np.float32))

    if calib_dir:
        import cv2
        import glob
        paths = sorted(
            p for ext in ('jpg', 'jpeg', 'png')
            for p in glob.glob(os.path.join(calib_dir, f'*.{ext}')))[:n]
        if paths:
            imgs = []
            for p in paths:
                img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (iw, ih))
                imgs.append(img.astype(np.float32) / 255.0)
            return [norm(np.stack(imgs))]
        print(f'no images found in {calib_dir}; falling back to '
              'synthetic calibration inputs', flush=True)
    else:
        print('int8 calibration on synthetic inputs; pass --calib-dir '
              'with representative images for best accuracy', flush=True)
    rng = np.random.RandomState(0)
    return [norm(rng.rand(8, ih, iw, 3).astype(np.float32))
            for _ in range(2)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--variant', default='s')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--port', type=int, default=8080)
    ap.add_argument('--host', default='127.0.0.1',
                    help='bind address (0.0.0.0 to expose beyond the '
                         'host/container)')
    ap.add_argument('--config', default=None,
                    help='optional config file (overrides --variant)')
    ap.add_argument('--fast', action='store_true',
                    help='serving-time math: bf16 + blocked Pallas '
                         'attention + tanh GELU (see PERF.md)')
    ap.add_argument('--int8', action='store_true',
                    help='additionally run the MLP matmuls W8A8 with '
                         'calibrated static scales (utils/quantize.py; '
                         '~13%% faster on v5e, small accuracy cost)')
    ap.add_argument('--int8-qkv', action='store_true',
                    help='also quantize attention qkv/proj (implies --int8)')
    ap.add_argument('--calib-dir', default=None,
                    help='directory of representative images for int8 '
                         'activation calibration (strongly recommended; '
                         'without it calibration falls back to synthetic '
                         'inputs and accuracy may degrade)')
    args = ap.parse_args()
    args.int8 = args.int8 or args.int8_qkv

    import dataclasses as dc
    from vitpose_tpu.api import init_pose_model
    backbone_type = 'vit'
    built = None
    if args.config:
        from vitpose_tpu.utils.config import load_config
        from vitpose_tpu.train.loop import build_model_from_cfg
        file_cfg = load_config(args.config)
        backbone_type = file_cfg['model'].get('backbone_type', 'vit')
        built = build_model_from_cfg(file_cfg['model'])
        model_cfg = built.cfg
    else:
        from vitpose_tpu.models import make_config
        model_cfg = make_config(args.variant, img_size=(256, 192),
                                out_channels=17)
    if args.fast:
        if backbone_type == 'vit':
            model_cfg = dc.replace(
                model_cfg, backbone=dc.replace(
                    model_cfg.backbone, dtype='bfloat16',
                    fused_attention=True, gelu_approx=True))
        else:
            print('--fast (bf16 + Pallas attention + tanh GELU) is a '
                  'ViT-path option; ignored for CNN backbones',
                  flush=True)
    if backbone_type == 'vit':
        model = init_pose_model(model_cfg, checkpoint=args.checkpoint)
        if args.config:
            # the config's dataset drives flip pairs/skeleton/metadata
            # (init_pose_model from a bare TopDownConfig defaults to coco)
            from vitpose_tpu.data import DatasetInfo
            model.dataset_info = DatasetInfo.load(
                file_cfg['data'].get('dataset', 'coco'))
    else:
        # CNN config zoo: serve the ACTUAL configured architecture (the
        # generic estimator), not a ViT built from the placeholder cfg
        import jax
        import jax.numpy as jnp
        from vitpose_tpu.api.inference import PoseModel
        from vitpose_tpu.data import DatasetInfo
        ih, iw = model_cfg.backbone.img_size
        if args.checkpoint:
            from vitpose_tpu.utils.cnn_ckpt import (
                convert_generic_topdown_checkpoint)
            variables = jax.tree.map(
                jnp.asarray,
                convert_generic_topdown_checkpoint(
                    args.checkpoint, backbone_type,
                    num_units=file_cfg['model'].get('num_units', 4),
                    use_prm=file_cfg['model'].get('use_prm', False)))
        else:
            variables = built.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, ih, iw, 3)))
        info = DatasetInfo.load(file_cfg['data'].get('dataset', 'coco'))
        model = PoseModel(model=built, variables=variables, cfg=model_cfg,
                          dataset_info=info, image_size=(iw, ih),
                          heatmap_size=(iw // 4, ih // 4))
    if args.int8 and backbone_type != 'vit':
        print('--int8 targets the ViT serving path; ignored for CNN '
              'backbones', flush=True)
        args.int8 = False
    if args.int8:
        import jax
        import jax.numpy as jnp
        from vitpose_tpu.models import TopDownModel
        from vitpose_tpu.utils.quantize import (calibrate_act_scales,
                                                int8_serving_config)
        ih, iw = model_cfg.backbone.img_size
        cal = _calibration_batches(args.calib_dir, ih, iw)
        scales = calibrate_act_scales(model.model, model.variables, cal,
                                      attn=args.int8_qkv)
        model.model = TopDownModel(int8_serving_config(model_cfg, scales,
                                                       qkv=args.int8_qkv))
        model._jitted.clear()          # force re-trace with the int8 path
    server = HTTPServer((args.host, args.port), make_handler(model))
    print(f'serving on http://{args.host}:{args.port} '
          f'(POST /predict, GET /health)', flush=True)
    server.serve_forever()


if __name__ == '__main__':
    main()
