"""Camera-controlled LVDM base + the three re-implemented baselines.

reference: CamContextI2V/model/base.py:20-482 (CameraControlLVDM),
baseline/motionctrl/motionctrl.py, baseline/cameractrl/cameractrl.py,
baseline/cami2v/cami2v.py. Each model differs only in what its
`camera_condition` hook returns and in which injection mode the UNet's
temporal blocks were configured with (UNetConfig.camera_mode / use_camera /
epipolar — replacing the reference's per-model monkey-patch modules).

Batch keys consumed on top of DynamiCrafter's:
  "RT":                (B, T, 4, 4) float w2c poses
  "camera_intrinsics": (B, T, 3, 3) float pixel-unit intrinsics
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from camc2v_tpu.camera import geometry as G
from camc2v_tpu.camera.pose_encoder import CameraPoseEncoder, PoseEncoderConfig
from camc2v_tpu.models.dynamicrafter import DynamiCrafter, DynamiCrafterConfig
from camc2v_tpu.nn.epipolar import EpipolarConfig


@dataclasses.dataclass(frozen=True)
class CameraControlConfig(DynamiCrafterConfig):
    pose_encoder: Optional[PoseEncoderConfig] = None
    normalize_T0: bool = False
    camera_embedding: str = "plucker"  # or "ray" (reference: model/base.py:27,125)


class CameraControlLVDM(DynamiCrafter):
    """Shared camera-model base: pose encoder + relative-pose helpers."""

    def __init__(self, config: CameraControlConfig, dtype=jnp.bfloat16):
        super().__init__(config, dtype=dtype)
        self.pose_encoder = (
            CameraPoseEncoder(config.pose_encoder, dtype=dtype)
            if config.pose_encoder is not None
            else None
        )

    def init_params(self, rng: jax.Array, image_hw: tuple[int, int] = (256, 256)) -> dict:
        base_rng, pe_rng = jax.random.split(rng)
        params = super().init_params(base_rng, image_hw)
        if self.pose_encoder is not None:
            H, W = image_hw
            plucker = jnp.zeros((1, self.config.video_length, H, W, 6))
            params["pose_encoder"] = self.pose_encoder.init(pe_rng, plucker)["params"]
        return params

    def example_camera_payload(self, image_hw: tuple[int, int]) -> Optional[dict]:
        cfg = self.config
        T = cfg.video_length
        cam: dict[str, Any] = {"cond_frame_index": jnp.zeros((1,), jnp.int32)}
        if cfg.unet.camera_mode == "motionctrl":
            return {"RT": jnp.zeros((1, T, cfg.unet.pose_dim))}
        if cfg.pose_encoder is not None:
            pe = cfg.pose_encoder
            h0 = image_hw[0] // pe.downscale_factor
            w0 = image_hw[1] // pe.downscale_factor
            cam["plucker"] = tuple(
                jnp.zeros((1, T, h0 // 2**i, w0 // 2**i, ch)) for i, ch in enumerate(pe.channels)
            )
        epi = getattr(cfg, "epipolar", None) or cfg.unet.epipolar
        if epi is not None and not epi.is_3d_full_attn:
            from camc2v_tpu.nn.epipolar import plain_epipolar

            if plain_epipolar(epi):
                cam["F"] = jnp.zeros((1, T, T, 3, 3))
            else:
                h = image_hw[0] // 8
                w = image_hw[1] // 8
                cam["masks"] = {
                    8 * ds: jnp.ones((1, T * (h // ds) * (w // ds), T * (h // ds) * (w // ds)), bool)
                    for ds in epi.attention_resolution
                }
        if len(cam) == 1:  # only cond_frame_index — no camera modules configured
            return None
        return cam

    # ------------------------------------------------------------- helpers
    def relative_c2w_from_batch(
        self, batch: dict, cond_frame_index: jax.Array, trace_scale_factor: float
    ) -> tuple[jax.Array, jax.Array]:
        """(K, relative_c2w) in f32. reference: model/base.py:112-198 +
        camcontexti2v.py:529-537 (w2c inverse, relative to cond frame,
        translation scaled by trace_scale_factor)."""
        K = jnp.asarray(batch["camera_intrinsics"], jnp.float32)
        w2c = jnp.asarray(batch["RT"], jnp.float32)
        c2w = jnp.linalg.inv(w2c)
        rel = G.relative_pose(c2w, cond_frame_index, mode="left", normalize_T0=self.config.normalize_T0)
        rel = rel.at[:, :, :3, 3].multiply(trace_scale_factor)
        return K, rel

    def plucker_features(
        self, params: dict, K: jax.Array, rel_c2w: jax.Array, H: int, W: int
    ) -> Optional[tuple[jax.Array, ...]]:
        if self.pose_encoder is None:
            return None
        plucker = G.plucker_embedding(
            K, rel_c2w, H, W, return_plucker=self.config.camera_embedding == "plucker"
        )
        return self.pose_encoder.apply({"params": params["pose_encoder"]}, plucker)


@dataclasses.dataclass(frozen=True)
class MotionCtrlConfig(CameraControlConfig):
    pose_dim: int = 12


class MotionCtrl(CameraControlLVDM):
    """RT-matrix conditioning baseline.

    reference: baseline/motionctrl/motionctrl.py:19-71 — the camera payload is
    the flattened relative w2c 3x4, consumed by cc_projection in every temporal
    block (UNetConfig.camera_mode='motionctrl').
    """

    def camera_condition(self, params, batch, cond_frame_index, trace_scale_factor):
        _, rel_c2w = self.relative_c2w_from_batch(batch, cond_frame_index, trace_scale_factor)
        rel_w2c = jnp.linalg.inv(rel_c2w)
        b, t = rel_w2c.shape[:2]
        return {"RT": rel_w2c[:, :, :3, :4].reshape(b, t, 12)}


class CameraCtrl(CameraControlLVDM):
    """Plücker pose-encoder baseline.

    reference: baseline/cameractrl/cameractrl.py:19-80 — plucker pyramid routed
    into every temporal block via zero-init cc_projection added to the attn1
    input (UNetConfig.camera_mode='cameractrl'). The 'ray' embedding variant is
    selected by `camera_embedding` (configs/baseline/cameractrl_256.yaml).
    """

    def camera_condition(self, params, batch, cond_frame_index, trace_scale_factor):
        H, W = batch["video"].shape[2:4]
        K, rel_c2w = self.relative_c2w_from_batch(batch, cond_frame_index, trace_scale_factor)
        plucker = self.plucker_features(params, K, rel_c2w, H, W)
        if plucker is None:
            return None
        return {"plucker": plucker}


@dataclasses.dataclass(frozen=True)
class CamI2VConfig(CameraControlConfig):
    epipolar: Optional[EpipolarConfig] = EpipolarConfig()
    add_type: str = "add_into_temporal_attn"


class CamI2V(CameraControlLVDM):
    """Plücker + epipolar-masked attention baseline.

    reference: baseline/cami2v/cami2v.py:21-241 — same machinery CamContextI2V
    inherits (pluker_projection + Epipolar per temporal block,
    UNetConfig.use_camera=True + UNetConfig.epipolar), without context frames.
    """

    def camera_condition(self, params, batch, cond_frame_index, trace_scale_factor):
        cfg: CamI2VConfig = self.config
        video = batch["video"]
        b, t, H, W = video.shape[:4]
        K, rel_c2w = self.relative_c2w_from_batch(batch, cond_frame_index, trace_scale_factor)

        cam: dict[str, Any] = {"cond_frame_index": cond_frame_index}

        if cfg.epipolar is not None and not cfg.epipolar.is_3d_full_attn:
            from camc2v_tpu.nn.epipolar import plain_epipolar

            pairs = G.relative_c2w_pairs(rel_c2w)  # (B, T, T, 4, 4)
            R = pairs[..., :3, :3]
            tvec = pairs[..., :3, 3:4]
            if cfg.epipolar.add_small_perturbation_on_zero_T:
                # DELIBERATE DEVIATION from the reference: a fixed PRNG key
                # instead of fresh randn per call (camcontexti2v.py:273-278).
                # The perturbation only randomises zero-translation (same-
                # frame) pairs whose 1e-6-scale direction is arbitrary by
                # construction; a fixed key keeps the train step deterministic
                # and retrace-free under jit. See also the borderline-bit
                # notes in tests/test_reference_parity.py.
                pkey = jax.random.key(0)
                tvec = G.add_small_perturbation(tvec, pkey)
            K_pairs = jnp.broadcast_to(K[:, None], (b, t, t, 3, 3))
            F = G.fundamental_matrix(K_pairs, R, tvec)
            if plain_epipolar(cfg.epipolar):
                # mask-free path: the UNet's epipolar kernels compute masks
                # in-kernel from F (ops/epipolar_flash.py) — no (B, L, L)
                # bools in HBM, no XLA mask-build fusions. Lines + the
                # scalar-prefetch tile maps depend only on geometry, so they
                # are prepared HERE, once, and ride the cond payload through
                # the whole denoise scan instead of being rebuilt every step
                from camc2v_tpu.nn.epipolar import prepare_plain_epipolar

                cam["F"] = F
                cam["epi_prep"] = prepare_plain_epipolar(F, cfg.epipolar)
            else:
                cam["masks"] = G.build_epipolar_masks(F, t, (H // 8, W // 8), cfg.epipolar)

        plucker = self.plucker_features(params, K, rel_c2w, H, W)
        if plucker is not None:
            cam["plucker"] = plucker
        return cam
