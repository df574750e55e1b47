"""ResNet conversion parity (vs a hand-built torch twin) + HRNet shapes."""
import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from vitpose_tpu.models.resnet import ResNet, convert_resnet_checkpoint
from vitpose_tpu.models.hrnet import HRNet, HRNetConfig


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


def make_torch_resnet50():
    """torchvision-layout ResNet-50 feature extractor (no fc)."""
    m = tnn.Module()
    m.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
    m.bn1 = tnn.BatchNorm2d(64)
    m.relu = tnn.ReLU(inplace=True)
    m.maxpool = tnn.MaxPool2d(3, 2, 1)

    def _layer(inp, planes, blocks, stride):
        ds = None
        if stride != 1 or inp != planes * 4:
            ds = tnn.Sequential(
                tnn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(inp, planes, stride, ds)]
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(planes * 4, planes))
        return tnn.Sequential(*layers)

    m.layer1 = _layer(64, 64, 3, 1)
    m.layer2 = _layer(256, 128, 4, 2)
    m.layer3 = _layer(512, 256, 6, 2)
    m.layer4 = _layer(1024, 512, 3, 2)

    def forward(x):
        x = m.maxpool(m.relu(m.bn1(m.conv1(x))))
        return m.layer4(m.layer3(m.layer2(m.layer1(x))))

    m.forward = forward
    return m


def test_resnet50_conversion_parity():
    torch.manual_seed(0)
    tm = make_torch_resnet50()
    tm.eval()
    x = np.random.RandomState(0).randn(2, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        ref = tm.forward(torch.from_numpy(x)).numpy()

    sd = {'backbone.' + k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_resnet_checkpoint(sd)
    model = ResNet(depth=50)
    out = model.apply({'params': params, 'batch_stats': stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_resnet18_shapes():
    m = ResNet(depth=18)
    x = jnp.ones((1, 64, 48, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 2, 2, 512)


def test_hrnet_output_resolution():
    m = HRNet(HRNetConfig(width=18, stage_modules=(1, 1, 1), stage_blocks=1))
    x = jnp.ones((1, 64, 48, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 16, 12, 18)       # 1/4 resolution, width chans
