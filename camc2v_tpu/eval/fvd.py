"""Fréchet Video Distance: JAX I3D feature extractor + Fréchet statistics.

reference: CamContextI2V/03_evaluation.py:79-147 delegates to the external
`fvdcal` package (LDenninger/FVD), which scores (gt, generated) mp4 pairs with
two I3D feature extractors — the "videogpt" variant (I3D trained on
Kinetics-400, 400 logits pre-softmax) and the "stylegan" variant (I3D with
terminal avg-pool features). Here:

  * `InceptionI3D` — a flax port of the standard Kinetics I3D
    (Carreira & Zisserman 2017), channels-last NDHWC;
  * `frechet_distance` — exact Fréchet/Wasserstein-2 between Gaussian fits
    (sqrtm via eigendecomposition of the symmetrised product);
  * `fvd_from_videos` — end-to-end scorer; feature weights load from a
    converted checkpoint (`I3D_WEIGHTS_PATH` env or argument) — absent
    weights raise a clear error rather than producing bogus numbers.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Unit3D(nn.Module):
    """Conv3D + BN + ReLU (the I3D building block)."""

    out_channels: int
    kernel: tuple[int, int, int] = (1, 1, 1)
    stride: tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, self.kernel, strides=self.stride, padding="SAME", use_bias=not self.use_bn
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, momentum=0.99)(x)
        if self.activation:
            x = nn.relu(x)
        return x


class InceptionBlock(nn.Module):
    """I3D inception module: 1x1 / 3x3 / 3x3(b) / pool-proj branches."""

    channels: tuple[int, int, int, int, int, int]  # b0, b1a, b1b, b2a, b2b, b3b

    @nn.compact
    def __call__(self, x):
        c = self.channels
        b0 = Unit3D(c[0], name="b0")(x)
        b1 = Unit3D(c[1], name="b1a")(x)
        b1 = Unit3D(c[2], (3, 3, 3), name="b1b")(b1)
        b2 = Unit3D(c[3], name="b2a")(x)
        b2 = Unit3D(c[4], (3, 3, 3), name="b2b")(b2)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        b3 = Unit3D(c[5], name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3D(nn.Module):
    """Kinetics-400 I3D. Input: (B, T, H, W, 3) in [-1, 1]; T>=9, H=W=224.

    `features='logits'` -> (B, 400) pre-softmax logits (videogpt-FVD variant);
    `features='pool'`   -> (B, 1024) average-pooled features (stylegan variant).
    """

    num_classes: int = 400
    features: str = "logits"

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = InceptionBlock((64, 96, 128, 16, 32, 32), name="Mixed_3b")(x)
        x = InceptionBlock((128, 128, 192, 32, 96, 64), name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock((192, 96, 208, 16, 48, 64), name="Mixed_4b")(x)
        x = InceptionBlock((160, 112, 224, 24, 64, 64), name="Mixed_4c")(x)
        x = InceptionBlock((128, 128, 256, 24, 64, 64), name="Mixed_4d")(x)
        x = InceptionBlock((112, 144, 288, 32, 64, 64), name="Mixed_4e")(x)
        x = InceptionBlock((256, 160, 320, 32, 128, 128), name="Mixed_4f")(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock((256, 160, 320, 32, 128, 128), name="Mixed_5b")(x)
        x = InceptionBlock((384, 192, 384, 48, 128, 128), name="Mixed_5c")(x)
        # global average pool over T, H, W
        pooled = jnp.mean(x, axis=(1, 2, 3))
        if self.features == "pool":
            return pooled
        logits = Unit3D(self.num_classes, use_bn=False, activation=False, name="logits")(
            pooled[:, None, None, None, :]
        )
        return logits[:, 0, 0, 0, :]


def gaussian_stats(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FD = |mu1-mu2|^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2})."""
    diff = mu1 - mu2
    # sqrtm of S1 @ S2 via scipy (symmetrised fallback on numerical failure)
    from scipy import linalg

    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


class FVDScorer:
    """End-to-end FVD over [-1,1] (N, T, H, W, 3) video arrays."""

    def __init__(self, weights_path: Optional[str] = None, variant: str = "videogpt"):
        self.variant = variant
        self.model = InceptionI3D(features="logits" if variant == "videogpt" else "pool")
        weights_path = weights_path or os.environ.get("I3D_WEIGHTS_PATH")
        if weights_path and os.path.exists(weights_path):
            archive = np.load(weights_path, allow_pickle=True)
            if "variables" not in getattr(archive, "files", []):
                raise ValueError(
                    f"{weights_path} is not a converted I3D checkpoint (missing "
                    "'variables' entry) — produce one with tools/convert_i3d_weights.py"
                )
            self.variables = dict(archive["variables"].item())
            if "params" not in self.variables:
                raise ValueError(
                    f"{weights_path}: 'variables' lacks a 'params' collection — "
                    "wrong or corrupted conversion"
                )
        else:
            self.variables = None

    def extract_features(self, videos: np.ndarray, batch_size: int = 8) -> np.ndarray:
        if self.variables is None:
            raise FileNotFoundError(
                "I3D weights not found — set I3D_WEIGHTS_PATH to a converted "
                "checkpoint (see eval/fvd.py docstring); FVD without pretrained "
                "features is meaningless."
            )
        feats = []
        apply = jax.jit(lambda v: self.model.apply(self.variables, v))
        for i in range(0, len(videos), batch_size):
            batch = jnp.asarray(videos[i : i + batch_size], jnp.float32)
            if batch.shape[2] != 224:
                b, t, h, w, c = batch.shape
                batch = jax.image.resize(batch, (b, t, 224, 224, c), "bilinear")
            feats.append(np.asarray(apply(batch)))
        return np.concatenate(feats)

    def __call__(self, real: np.ndarray, generated: np.ndarray) -> float:
        f_real = self.extract_features(real)
        f_gen = self.extract_features(generated)
        return frechet_distance(*gaussian_stats(f_real), *gaussian_stats(f_gen))
