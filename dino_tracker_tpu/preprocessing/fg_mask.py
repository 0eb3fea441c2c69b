"""Foreground mask from DINO-feature PCA.

Behavior spec: reference preprocessing/create_fg_mask.py — L2-normalize all
frames' patch features, project onto the top-3 principal directions,
min-max-normalize, threshold the first component (< fg_mask_threshold ⇒
foreground), nearest-upsample to video resolution.

Deviation (documented): the reference uses ``torch.pca_lowrank`` (randomized
SVD, sign depends on its RNG); we use the exact covariance eigendecomposition
and orient the first component so the image-border mean exceeds the interior
mean (border ≈ background ⇒ background gets the high values the threshold
cuts away). This removes the reference's sign nondeterminism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pca_project(features_flat_nc, q: int = 3):
    """Principal directions of the centered features; returns (n×q
    projections of the *uncentered* features, V c×q) — matching
    ``torch.pca_lowrank`` + ``features @ V`` (create_fg_mask.py:29-31)."""
    mean = jnp.mean(features_flat_nc, axis=0, keepdims=True)
    centered = features_flat_nc - mean
    cov = jnp.dot(centered.T, centered, preferred_element_type=jnp.float32)
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    v = evecs[:, ::-1][:, :q]  # top-q directions
    return jnp.dot(features_flat_nc, v), v


def compute_fg_masks(features_tchw, out_hw, fg_mask_threshold: float = 0.6,
                     q: int = 3) -> np.ndarray:
    """T×C×h'×w' features -> T×H×W float32 {0,1} masks at video resolution."""
    t, c, hp, wp = features_tchw.shape
    feats = jnp.asarray(features_tchw).transpose(0, 2, 3, 1).reshape(-1, c)
    feats = feats / jnp.clip(jnp.linalg.norm(feats, axis=-1, keepdims=True),
                             min=1e-12)
    colors, _ = pca_project(feats, q=q)
    cmin = jnp.min(colors, axis=0)
    cmax = jnp.max(colors, axis=0)
    normed = (colors - cmin) / (cmax - cmin)
    comp0 = np.asarray(normed[:, 0]).reshape(t, hp, wp)

    # sign orientation: border ≈ background must carry the HIGH values
    border = np.concatenate([comp0[:, 0, :].ravel(), comp0[:, -1, :].ravel(),
                             comp0[:, :, 0].ravel(), comp0[:, :, -1].ravel()])
    if border.mean() < comp0.mean():
        comp0 = 1.0 - comp0

    fg = (comp0 < fg_mask_threshold).astype(np.float32)

    h, w = out_hw
    ys = np.floor(np.arange(h) * hp / h).astype(np.int64)
    xs = np.floor(np.arange(w) * wp / w).astype(np.int64)
    return fg[:, ys][:, :, xs]
