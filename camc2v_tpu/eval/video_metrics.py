"""Frame-quality metrics: MSE / RMSE / PSNR / SSIM (+LPIPS when torch weights exist).

reference: CamContextI2V/03_evaluation.py:422-516 (torchmetrics SSIM/LPIPS over
uint8-range frames, per-timestep breakdowns). SSIM here is the standard
Gaussian-window formulation in numpy (data_range=255, matching torchmetrics
defaults); LPIPS needs pretrained net weights and degrades gracefully when
absent.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def mse(a: np.ndarray, b: np.ndarray) -> float:
    """Mean squared error over uint8-range frames."""
    return float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(mse(a, b)))


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    m = mse(a, b)
    return float(10 * np.log10(data_range**2 / max(m, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """SSIM over (H, W, C) or (N, H, W, C) frames (Gaussian 11x11, K1/K2 std)."""
    from scipy.signal import convolve2d  # scipy ships with this image

    if a.ndim == 4:
        return float(np.mean([ssim(x, y, data_range) for x, y in zip(a, b)]))
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    k = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mu_x = convolve2d(x, k, mode="valid")
        mu_y = convolve2d(y, k, mode="valid")
        xx = convolve2d(x * x, k, mode="valid") - mu_x**2
        yy = convolve2d(y * y, k, mode="valid") - mu_y**2
        xy = convolve2d(x * y, k, mode="valid") - mu_x * mu_y
        s = ((2 * mu_x * mu_y + c1) * (2 * xy + c2)) / ((mu_x**2 + mu_y**2 + c1) * (xx + yy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))


def lpips(a: np.ndarray, b: np.ndarray, net: str = "squeeze") -> Optional[float]:
    """LPIPS via torchmetrics when its pretrained weights are available locally."""
    try:
        import torch
        from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity

        m = LearnedPerceptualImagePatchSimilarity(net_type=net)
        ta = torch.from_numpy(a.astype(np.float32) / 127.5 - 1.0).permute(0, 3, 1, 2)
        tb = torch.from_numpy(b.astype(np.float32) / 127.5 - 1.0).permute(0, 3, 1, 2)
        return float(m(ta, tb))
    except Exception:
        return None


def video_pair_metrics(gt: np.ndarray, gen: np.ndarray, with_lpips: bool = True) -> dict:
    """Per-video metric dict over uint8 (T, H, W, 3) frame stacks.

    Also returns per-timestep MSE (reference computes per-timestep breakdowns,
    03_evaluation.py:470-516).
    """
    t = min(len(gt), len(gen))
    gt, gen = gt[:t], gen[:t]
    per_t_mse = [mse(gt[i], gen[i]) for i in range(t)]
    out = {
        "mse": float(np.mean(per_t_mse)),
        "rmse": float(np.sqrt(np.mean(per_t_mse))),
        "psnr": psnr(gt, gen),
        "ssim": ssim(gt, gen),
        "mse_per_timestep": per_t_mse,
    }
    if with_lpips:
        lp = lpips(gt, gen)
        if lp is not None:
            out["lpips"] = lp
    return out
