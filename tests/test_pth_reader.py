"""Pure-python .pth reader vs torch.load golden test."""
import tempfile

import numpy as np
import torch

from vitpose_tpu.utils.pth_reader import load_pth


def test_pth_reader_matches_torch():
    sd = {
        'w': torch.randn(96, 32),
        'pos': torch.randn(1, 13, 32),
        'var64': torch.rand(16).double(),
        'bf16': torch.randn(4, 4).bfloat16(),
        'scalar': torch.tensor(3),
        'bytes': torch.arange(6, dtype=torch.uint8),
        'strided': torch.randn(8, 8).t(),
        'half': torch.randn(3, 3).half(),
        'flag': torch.tensor([True, False]),
    }
    tmp = tempfile.mkdtemp()
    torch.save({'state_dict': sd, 'meta': {'epoch': 7}}, f'{tmp}/m.pth')
    out = load_pth(f'{tmp}/m.pth')
    assert out['meta']['epoch'] == 7
    for k, v in sd.items():
        ref = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
        got = out['state_dict'][k]
        np.testing.assert_allclose(np.asarray(got, np.float64),
                                   np.asarray(ref, np.float64))
