"""flax ResNet feature extractor vs a torch oracle (models/resnet.py).

The oracle re-states the public bottleneck-ResNet architecture with the
reference's two modifications (ceil-mode pad-0 stem maxpool; downsample
stride on conv1 for stages 2-4 — captioning/utils/resnet.py:6-12) plus the
myResnet fc/att head (resnet_utils.py:10-26), in plain torch.  A small
[1,1,1,1] configuration keeps the test fast; every structural element the
101 config uses (stem, strided stages, downsample branches, adaptive pool)
is exercised.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: torch oracles / subprocesses

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402

from boficap_tpu.models.resnet import (  # noqa: E402
    IMAGENET_MEAN, IMAGENET_STD, _adaptive_pool_matrix, init_resnet_params,
    load_torch_resnet_state, normalize_images, resnet_features)

LAYERS = (1, 1, 1, 1)
MID = (64, 128, 256, 512)


class TorchBottleneck(nn.Module):
    def __init__(self, cin, mid, stride, stride_on_conv1):
        super().__init__()
        s1 = stride if stride_on_conv1 else 1
        s2 = 1 if stride_on_conv1 else stride
        self.conv1 = nn.Conv2d(cin, mid, 1, stride=s1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride=s2, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, mid * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(mid * 4)
        self.downsample = nn.Sequential(
            nn.Conv2d(cin, mid * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(mid * 4)) if (stride != 1 or cin != mid * 4) \
            else None

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        x = self.downsample(x) if self.downsample is not None else x
        return F.relu(x + h)


class TorchOracle(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=0, ceil_mode=True)
        cin = 64
        for si, n in enumerate(LAYERS):
            blocks = []
            for bi in range(n):
                blocks.append(TorchBottleneck(
                    cin, MID[si], stride=1 if si == 0 else
                    (2 if bi == 0 else 1),
                    stride_on_conv1=(si > 0 and bi == 0)))
                cin = MID[si] * 4
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x, att_size=14):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for si in range(4):
            x = getattr(self, f"layer{si + 1}")(x)
        fc = x.mean(3).mean(2)
        att = F.adaptive_avg_pool2d(x, [att_size, att_size]) \
            .permute(0, 2, 3, 1)
        return fc, att


def _randomized_state_dict(model, seed=0):
    rng = np.random.RandomState(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        arr = rng.randn(*v.shape).astype(np.float32) * 0.05
        if "running_var" in k:
            arr = np.abs(arr) + 0.5
        sd[k] = torch.from_numpy(arr)
    model.load_state_dict(sd)
    return sd


def test_flax_resnet_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = TorchOracle().eval()
    sd = _randomized_state_dict(oracle)
    params = load_torch_resnet_state(
        {k: v.numpy() for k, v in sd.items()
         if not k.endswith("num_batches_tracked")}, layers=LAYERS)

    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 95, 113, 3).astype(np.float32)  # odd sizes: ceil path
    x = normalize_images(imgs)
    with torch.no_grad():
        fc_t, att_t = oracle(torch.from_numpy(
            x.transpose(0, 3, 1, 2)), att_size=7)
    fc_j, att_j = jax.jit(
        lambda p, i: resnet_features(p, i, att_size=7))(params, x)
    np.testing.assert_allclose(np.asarray(fc_j), fc_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(att_j).reshape(2, 7, 7, -1), att_t.numpy(),
        rtol=1e-4, atol=1e-4)


def test_ceil_maxpool_matches_torch():
    from boficap_tpu.models.resnet import _maxpool_ceil
    rng = np.random.RandomState(2)
    for H, W in ((224, 224), (223, 111), (9, 14)):
        x = rng.randn(1, H, W, 4).astype(np.float32)
        want = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            3, stride=2, padding=0, ceil_mode=True)
        got = _maxpool_ceil(jax.numpy.asarray(x))
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
            rtol=1e-6, atol=1e-6)


def test_adaptive_pool_matrix_matches_torch():
    rng = np.random.RandomState(3)
    for n_in, n_out in ((7, 14), (14, 14), (29, 14), (100, 7)):
        x = rng.randn(1, 5, n_in, n_in).astype(np.float32)
        want = F.adaptive_avg_pool2d(torch.from_numpy(x),
                                     [n_out, n_out]).numpy()
        m = _adaptive_pool_matrix(n_in, n_out)
        got = np.einsum("bchw,hi,wj->bcij", x, m, m)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resnet101_shapes_and_import_roundtrip():
    """Full-depth config: init tree shapes equal an imported state dict's,
    and a 448 input yields the native 14x14 att grid."""
    params = init_resnet_params(jax.random.PRNGKey(0))
    assert len(params["layer3"]) == 23
    imgs = np.zeros((1, 448, 448, 3), np.float32)
    fc, att = jax.jit(resnet_features)(params, imgs)
    assert fc.shape == (1, 2048) and att.shape == (1, 196, 2048)


def test_normalize_images_dark_uint8():
    """dtype, not a value heuristic, decides the /255: a batch of
    near-black uint8 frames (max <= 1.5) must still scale."""
    dark = np.ones((1, 4, 4, 3), np.uint8)
    want = (np.full((1, 4, 4, 3), 1 / 255.0, np.float32)
            - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(normalize_images(dark), want, rtol=1e-6)
    # float inputs keep the value heuristic: [0,1] floats pass through
    x01 = np.full((1, 2, 2, 3), 0.5, np.float32)
    got = normalize_images(x01)
    np.testing.assert_allclose(
        got, np.broadcast_to((0.5 - IMAGENET_MEAN) / IMAGENET_STD,
                             x01.shape), rtol=1e-6)
