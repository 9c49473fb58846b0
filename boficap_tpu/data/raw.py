"""Eval-on-a-folder data path (parity with reference DataLoaderRaw,
captioning/data/dataloaderraw.py:24-146): read raw images from a directory
and produce (fc, att) features on the fly.

The reference runs a modified torchvision ResNet-101 (utils/resnet.py +
resnet_utils.myResnet) to make fc(2048) + 14x14x2048 att features.  This
environment ships neither torchvision nor pretrained CNN weights (no
network egress), so the extractor is pluggable:

  * ``flax_resnet`` — the TPU-native ResNet-101 trunk
    (models/resnet.py): the reference's modified architecture (ceil-mode
    stem pool, stride-on-conv1 stages) re-expressed in flax/XLA, batched at
    a static 448x448 input, torch-parity-tested.  Loads a torchvision
    ``resnet101`` state_dict from ``$BOFICAP_CNN_WEIGHTS`` (or the
    ``weights`` arg) when one exists; random He-init otherwise (warned —
    untrained features),
  * ``resnet``  — torchvision ResNet-101 when installed (weights from the
    torch hub cache), reproducing the reference's ceil-mode/stride tweaks'
    OUTPUT contract (fc = pooled features, att = 14x14 grid),
  * ``patch``   — dependency-free fallback: 14x14 mean-pooled RGB patches
    tiled to 2048 dims.  NOT a trained feature extractor — it exists so the
    raw-image pipeline is runnable end to end anywhere; captions from it are
    only as good as the captioner's robustness to untrained features,
  * any callable ``image [H,W,3] float -> (fc [D], att [G,G,D])``.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp")


def patch_extractor(grid: int = 14, dim: int = 2048):
    """Mean-RGB patch features (see module docstring caveat)."""

    def extract(img: np.ndarray):
        H, W, _ = img.shape
        gh, gw = H // grid, W // grid
        att = np.zeros((grid, grid, dim), np.float32)
        for i in range(grid):
            for j in range(grid):
                patch = img[i * gh:(i + 1) * gh, j * gw:(j + 1) * gw]
                m = patch.reshape(-1, 3).mean(0)
                s = patch.reshape(-1, 3).std(0)
                feat = np.concatenate([m, s])
                att[i, j] = np.tile(feat, dim // len(feat) + 1)[:dim]
        return att.mean((0, 1)), att

    return extract


def flax_resnet_extractor(weights: Optional[str] = None, size: int = 448):
    """TPU-native ResNet-101 features (models/resnet.py).  ``weights``: a
    torch ``resnet101`` state-dict .pth (defaults to $BOFICAP_CNN_WEIGHTS);
    without one the trunk is random-init (untrained features, warned).
    Images are bilinearly resized to ``size`` x ``size`` — at 448 the
    layer4 map is natively 14x14, so the adaptive att pool is exact.
    Resize + ImageNet normalization + forward run as ONE jit program per
    input shape: the image is uploaded once, nothing round-trips to host."""
    import jax
    import jax.numpy as jnp

    from ..models.resnet import (IMAGENET_MEAN, IMAGENET_STD,
                                 init_resnet_params,
                                 load_torch_resnet_state, resnet_features)

    weights = weights or os.environ.get("BOFICAP_CNN_WEIGHTS", "")
    if weights:
        try:
            import torch
            sd = torch.load(weights, map_location="cpu")
            sd = {k: v.numpy() if hasattr(v, "numpy") else v
                  for k, v in sd.items()}
            params = load_torch_resnet_state(sd)
        except Exception as e:
            raise RuntimeError(
                f"BOFICAP_CNN_WEIGHTS={weights!r} could not be loaded as a "
                f"torchvision resnet101 state dict: {e}") from e
    else:
        print("flax ResNet-101 extractor: no $BOFICAP_CNN_WEIGHTS state "
              "dict — using RANDOM weights (untrained features)")
        params = init_resnet_params(jax.random.PRNGKey(0))

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    @jax.jit
    def feats(params, img):                    # img [H, W, 3] in [0, 1]
        x = jax.image.resize(img, (size, size, 3), "bilinear")
        x = (x - mean) / std
        return resnet_features(params, x[None])

    def extract(img: np.ndarray):
        fc, att = feats(params, jnp.asarray(img, jnp.float32))
        return (np.asarray(fc[0]),
                np.asarray(att[0]).reshape(14, 14, -1))

    return extract


def resnet_extractor(cnn_model: str = "resnet101"):
    """torchvision ResNet matching the reference's myResnet contract
    (resnet_utils.py:10-26: fc = global pool, att = 14x14 adaptive grid).
    ``cnn_model``: resnet101 (default) or resnet152, like the reference's
    --cnn_model flag (tools/eval.py:28-29)."""
    import torch
    import torchvision

    cnn = getattr(torchvision.models, cnn_model)(weights="IMAGENET1K_V1")
    cnn.eval()
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def extract(img: np.ndarray):
        x = torch.from_numpy(((img - mean) / std).transpose(2, 0, 1))[None]
        with torch.no_grad():
            x = cnn.conv1(x)
            x = cnn.bn1(x)
            x = cnn.relu(x)
            x = cnn.maxpool(x)
            x = cnn.layer1(x)
            x = cnn.layer2(x)
            x = cnn.layer3(x)
            x = cnn.layer4(x)                       # [1, 2048, h, w]
            fc = x.mean((2, 3))[0].numpy()
            att = torch.nn.functional.adaptive_avg_pool2d(x, (14, 14))
            att = att[0].permute(1, 2, 0).numpy()   # [14, 14, 2048]
        return fc, att

    return extract


class DataLoaderRaw:
    """get_batch over a folder of images (reference dataloaderraw.py)."""

    def __init__(self, image_folder: str, batch_size: int = 10,
                 extractor: Optional[Callable] = None, coco_json: str = "",
                 cnn_model: str = "resnet101"):
        if cnn_model not in ("resnet101", "resnet152"):
            # validate BEFORE the try/except fallback chain below, which
            # would otherwise swallow a typo'd model name and silently
            # substitute an untrained extractor
            raise ValueError(
                f"cnn_model must be resnet101 or resnet152 (reference "
                f"tools/eval.py:28-29), got {cnn_model!r}")
        self.folder = image_folder
        self.batch_size = batch_size
        if extractor is None:
            if os.environ.get("BOFICAP_CNN_WEIGHTS"):
                # explicitly configured: surface load errors, don't degrade
                extractor = flax_resnet_extractor()
            else:
                try:
                    extractor = resnet_extractor(cnn_model)
                except Exception:
                    import jax
                    if jax.default_backend() != "cpu":
                        # accelerator present: the random-weight flax trunk
                        # is fast and exercises the real CNN path
                        extractor = flax_resnet_extractor()
                    else:
                        # CPU-only host: a random-weight ResNet-101 forward
                        # per image is pointlessly slow for equally
                        # untrained features
                        print("torchvision unavailable and no accelerator; "
                              "using the untrained patch extractor "
                              "(features are NOT CNN features)")
                        extractor = patch_extractor()
        self.extract = extractor

        if coco_json:
            import json
            info = json.load(open(coco_json))
            self.files = [img["file_name"] for img in info["images"]]
            self.ids = [img["id"] for img in info["images"]]
        else:
            self.files = sorted(
                f for f in os.listdir(image_folder)
                if f.lower().endswith(IMAGE_EXTS))
            self.ids = list(range(len(self.files)))
        self.cursor = 0

    def __len__(self):
        return len(self.files)

    def reset_iterator(self, split: str = ""):
        self.cursor = 0

    def get_batch(self, split: str = "") -> dict:
        from PIL import Image
        B = self.batch_size
        fc = []
        att = []
        infos = []
        wrapped = False
        for _ in range(B):
            if self.cursor >= len(self.files):
                self.cursor = 0
                wrapped = True
            fname = self.files[self.cursor]
            img = np.asarray(
                Image.open(os.path.join(self.folder, fname)).convert("RGB"),
                np.float32) / 255.0
            f, a = self.extract(img)
            fc.append(f)
            att.append(a.reshape(-1, a.shape[-1]))
            infos.append({"id": self.ids[self.cursor], "file_path": fname})
            self.cursor += 1
        R = max(x.shape[0] for x in att)
        D = att[0].shape[1]
        att_b = np.zeros((B, R, D), np.float32)
        am = np.zeros((B, R), np.float32)
        for i, a in enumerate(att):
            att_b[i, :a.shape[0]] = a
            am[i, :a.shape[0]] = 1
        return {"fc_feats": np.stack(fc), "att_feats": att_b,
                "att_masks": am, "labels": None, "masks": None,
                "gts": [[] for _ in range(B)], "infos": infos,
                "bounds": {"it_pos_now": self.cursor,
                           "it_max": len(self.files), "wrapped": wrapped}}
