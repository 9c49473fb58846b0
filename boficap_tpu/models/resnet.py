"""TPU-native ResNet-101 feature extractor (flax) for the raw-image path.

The reference extracts region-free CNN features with a MODIFIED torchvision
ResNet-101 (captioning/utils/resnet.py:6-12) wrapped by ``myResnet``
(captioning/utils/resnet_utils.py:10-26):

  * stem maxpool is kernel 3, stride 2, padding 0, **ceil_mode=True**
    (torchvision stock uses padding 1, floor);
  * stages 2-4 move the first block's downsampling stride from the 3x3
    conv2 onto the 1x1 conv1 (the Caffe-style layout);
  * ``fc``  = global mean of the layer4 map            -> [2048]
  * ``att`` = adaptive_avg_pool2d(layer4, 14x14) HWC   -> [196, 2048]

This module re-expresses that trunk the TPU way: NHWC convolutions batched
over B images at a STATIC input size (448x448 by default, which makes the
layer4 map exactly 14x14), inference-mode batch-norm as a folded affine,
ceil-mode pooling via an explicitly padded ``reduce_window``, and torch's
adaptive-average-pool binning as two small matmul contractions (exact
semantics: bin i averages rows floor(i*H/O) .. ceil((i+1)*H/O)-1).  The
whole forward jits into one XLA program; weights import from a torchvision
``resnet101`` state_dict via :func:`load_torch_resnet_state` (no
torchvision dependency — a state_dict is just tensors).

The reference runs images one at a time at native size on GPU
(captioning/data/dataloaderraw.py:106-117); fixed-size batched extraction
is the idiomatic TPU trade (static shapes for XLA, MXU-sized conv tiles).
Callers resize+normalize on host (see data/raw.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# stage plan: (blocks, mid_channels); expansion 4 (ResNet-101 = 3,4,23,3)
RESNET101_LAYERS = (3, 4, 23, 3)
_STAGE_MID = (64, 128, 256, 512)
EXPANSION = 4


def _conv(x, w, stride: int = 1, padding: int = 0):
    """NHWC conv with HWIO kernel (torch OIHW kernels are transposed at
    load time)."""
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p):
    """Inference batch-norm: the running-stats affine, folded to two
    broadcast ops (torch BatchNorm2d.eval semantics, eps 1e-5)."""
    scale = p["gamma"] / jnp.sqrt(p["var"] + BN_EPS)
    return x * scale + (p["beta"] - p["mean"] * scale)


def _maxpool_ceil(x, k: int = 3, s: int = 2):
    """Max pool, padding 0, ceil_mode=True (reference resnet.py:9): pad the
    bottom/right with -inf so the final partial window is kept, exactly
    torch's ceil-mode output size ceil((H - k)/s) + 1."""
    H, W = x.shape[1], x.shape[2]
    oh = -(-(H - k) // s) + 1
    ow = -(-(W - k) // s) + 1
    ph = max(0, (oh - 1) * s + k - H)
    pw = max(0, (ow - 1) * s + k - W)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (0, ph), (0, pw), (0, 0)))


def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_in, n_out] averaging weights reproducing torch
    adaptive_avg_pool1d binning: bin j spans floor(j*n/o) ..
    ceil((j+1)*n/o) - 1 inclusive."""
    m = np.zeros((n_in, n_out), np.float32)
    for j in range(n_out):
        a = (j * n_in) // n_out
        b = -(-((j + 1) * n_in) // n_out)
        m[a:b, j] = 1.0 / (b - a)
    return m


def bottleneck(x, p, stride: int = 1, stride_on_conv1: bool = False):
    """torchvision Bottleneck forward; ``stride_on_conv1`` is the
    reference's stage-2..4 modification (stride moves 3x3 -> 1x1,
    resnet.py:10-12)."""
    s1 = stride if stride_on_conv1 else 1
    s2 = 1 if stride_on_conv1 else stride
    h = jax.nn.relu(_bn(_conv(x, p["conv1"], s1), p["bn1"]))
    h = jax.nn.relu(_bn(_conv(h, p["conv2"], s2, padding=1), p["bn2"]))
    h = _bn(_conv(h, p["conv3"]), p["bn3"])
    if "downsample" in p:
        x = _bn(_conv(x, p["downsample"]["conv"], stride),
                p["downsample"]["bn"])
    return jax.nn.relu(x + h)


def resnet_features(params: Dict[str, Any], imgs: jnp.ndarray,
                    att_size: int = 14) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """imgs [B, H, W, 3] (ImageNet-normalized) -> (fc [B, 2048],
    att [B, att_size*att_size, 2048]); myResnet.forward semantics
    (resnet_utils.py:10-26) batched."""
    x = jax.nn.relu(_bn(_conv(imgs, params["conv1"], 2, padding=3),
                        params["bn1"]))
    x = _maxpool_ceil(x)
    for si in range(4):
        stage = params[f"layer{si + 1}"]
        stride = 1 if si == 0 else 2
        for bi, bp in enumerate(stage):
            x = bottleneck(x, bp, stride=stride if bi == 0 else 1,
                           stride_on_conv1=(si > 0 and bi == 0))
    fc = jnp.mean(x, axis=(1, 2))                      # [B, 2048]
    ph = jnp.asarray(_adaptive_pool_matrix(x.shape[1], att_size))
    pw = jnp.asarray(_adaptive_pool_matrix(x.shape[2], att_size))
    att = jnp.einsum("bhwc,hi,wj->bijc", x, ph, pw)
    return fc, att.reshape(x.shape[0], att_size * att_size, -1)


# ---------------------------------------------------------------------------
# Weight init / torch import
# ---------------------------------------------------------------------------


def _he_conv(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return (jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
            * math.sqrt(2.0 / fan_in))


def _bn_init(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_resnet_params(key, layers: Sequence[int] = RESNET101_LAYERS
                       ) -> Dict[str, Any]:
    """Random He-init parameter tree with the torchvision layout (for tests
    and for shape-checking imports)."""
    keys = iter(jax.random.split(key, 4 + sum(layers) * 4))
    params: Dict[str, Any] = {
        "conv1": _he_conv(next(keys), 7, 7, 3, 64), "bn1": _bn_init(64)}
    cin = 64
    for si, n_blocks in enumerate(layers):
        mid = _STAGE_MID[si]
        cout = mid * EXPANSION
        stage = []
        for bi in range(n_blocks):
            bp = {
                "conv1": _he_conv(next(keys), 1, 1, cin, mid),
                "bn1": _bn_init(mid),
                "conv2": _he_conv(next(keys), 3, 3, mid, mid),
                "bn2": _bn_init(mid),
                "conv3": _he_conv(next(keys), 1, 1, mid, cout),
                "bn3": _bn_init(cout),
            }
            if bi == 0:
                bp["downsample"] = {
                    "conv": _he_conv(next(keys), 1, 1, cin, cout),
                    "bn": _bn_init(cout)}
            stage.append(bp)
            cin = cout
        params[f"layer{si + 1}"] = stage
    return params


def _t(arr) -> np.ndarray:
    a = np.asarray(arr, np.float32)
    return a.transpose(2, 3, 1, 0) if a.ndim == 4 else a   # OIHW -> HWIO


def load_torch_resnet_state(sd: Dict[str, Any],
                            layers: Sequence[int] = RESNET101_LAYERS
                            ) -> Dict[str, Any]:
    """torchvision ``resnet101().state_dict()`` (or the reference's
    ``resnet101.pth``) -> the parameter tree ``resnet_features`` consumes.
    Accepts tensors or ndarrays; ignores the classifier ``fc.*`` entries."""
    def bn(prefix):
        return {"gamma": _t(sd[prefix + ".weight"]),
                "beta": _t(sd[prefix + ".bias"]),
                "mean": _t(sd[prefix + ".running_mean"]),
                "var": _t(sd[prefix + ".running_var"])}

    params: Dict[str, Any] = {"conv1": _t(sd["conv1.weight"]),
                              "bn1": bn("bn1")}
    for si, n_blocks in enumerate(layers):
        stage = []
        for bi in range(n_blocks):
            pre = f"layer{si + 1}.{bi}"
            bp = {"conv1": _t(sd[pre + ".conv1.weight"]),
                  "bn1": bn(pre + ".bn1"),
                  "conv2": _t(sd[pre + ".conv2.weight"]),
                  "bn2": bn(pre + ".bn2"),
                  "conv3": _t(sd[pre + ".conv3.weight"]),
                  "bn3": bn(pre + ".bn3")}
            if pre + ".downsample.0.weight" in sd:
                bp["downsample"] = {
                    "conv": _t(sd[pre + ".downsample.0.weight"]),
                    "bn": bn(pre + ".downsample.1")}
            stage.append(bp)
        params[f"layer{si + 1}"] = stage
    return jax.tree.map(jnp.asarray, params)


def normalize_images(imgs: np.ndarray) -> np.ndarray:
    """uint8/float [B, H, W, 3] in [0, 255] or [0, 1] -> ImageNet-normalized
    float32 (reference preprocess, dataloaderraw.py:16-19)."""
    arr = np.asarray(imgs)
    x = arr.astype(np.float32)
    # integer inputs are ALWAYS 0-255 (a batch of near-black uint8 frames
    # can max out below 1.5 — dtype, not value, decides); the value
    # heuristic only disambiguates float inputs of unknown provenance
    if np.issubdtype(arr.dtype, np.integer) or x.max() > 1.5:
        x = x / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD
