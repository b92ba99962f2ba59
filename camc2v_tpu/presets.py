"""Flagship model presets mirroring the reference config tree.

reference: configs/models/camcontexti2v_256.yaml, configs/baseline/
{dynamicrafter,motionctrl,cameractrl,cami2v}_256.yaml. These are the
production-size configurations; tests use hand-rolled tiny variants.
"""

from __future__ import annotations

from camc2v_tpu.camera.pose_encoder import PoseEncoderConfig
from camc2v_tpu.models.camcontexti2v import AdaptorConfig, CamContextI2VConfig
from camc2v_tpu.models.camera_base import CamI2VConfig, CameraControlConfig, MotionCtrlConfig
from camc2v_tpu.models.dynamicrafter import DynamiCrafterConfig, ResamplerConfig
from camc2v_tpu.nn.clip import CLIPTextConfig, CLIPVisionConfig
from camc2v_tpu.nn.epipolar import EpipolarConfig
from camc2v_tpu.nn.unet3d import UNetConfig
from camc2v_tpu.nn.vae import VAEConfig


def unet_256(**overrides) -> UNetConfig:
    """reference: configs/models/camcontexti2v_256.yaml:40-72."""
    base = dict(
        in_channels=8,
        out_channels=4,
        model_channels=320,
        num_res_blocks=2,
        attention_resolutions=(4, 2, 1),
        dropout=0.1,
        channel_mult=(1, 2, 4, 4),
        num_head_channels=64,
        transformer_depth=1,
        context_dim=1024,
        temporal_conv=True,
        temporal_attention=True,
        temporal_selfatt_only=True,
        use_relative_position=False,
        use_causal_attention=False,
        temporal_length=16,
        addition_attention=True,
        image_cross_attention=True,
        image_cross_attention_scale_learnable=True,
        default_fs=3,
        fs_condition=True,
    )
    base.update(overrides)
    return UNetConfig(**base)


VAE_256 = VAEConfig(
    double_z=True, z_channels=4, resolution=256, in_channels=3, out_ch=3,
    ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2, embed_dim=4,
)

RESAMPLER_256 = ResamplerConfig(
    dim=1024, depth=4, dim_head=64, heads=12, num_queries=16,
    embedding_dim=1280, output_dim=1024, ff_mult=4, video_length=16,
    use_timestep_emb=True,
)

POSE_ENCODER_256 = PoseEncoderConfig(
    downscale_factor=8, channels=(320, 640, 1280, 1280), nums_rb=2, cin=384,
    ksize=1, sk=True, use_conv=False, compression_factor=1,
    temporal_attention_nhead=8, temporal_position_encoding=True,
    temporal_position_encoding_max_len=16,
)

EPIPOLAR_256 = EpipolarConfig(
    origin_h=256, origin_w=256, is_3d_full_attn=False, num_register_tokens=4,
    attention_resolution=(8, 4, 2, 1), compression_factor=1,
    add_small_perturbation_on_zero_T=True,
)

_DIFFUSION_256 = dict(
    timesteps=1000,
    beta_schedule="linear",
    linear_start=0.00085,
    linear_end=0.012,
    rescale_betas_zero_snr=False,
    parameterization="eps",
    scale_factor=0.18215,
    uncond_prob=0.05,
    uncond_type="empty_seq",
    rand_cond_frame=False,
    fps_condition_type="fs",
    vae=VAE_256,
    clip_text=CLIPTextConfig(),
    clip_vision=CLIPVisionConfig(),
    resampler=RESAMPLER_256,
)


def dynamicrafter_256() -> DynamiCrafterConfig:
    return DynamiCrafterConfig(unet=unet_256(), loss_type="l2", **_DIFFUSION_256)


def motionctrl_256() -> MotionCtrlConfig:
    return MotionCtrlConfig(
        unet=unet_256(camera_mode="motionctrl"), loss_type="l2", **_DIFFUSION_256
    )


def cameractrl_256() -> CameraControlConfig:
    return CameraControlConfig(
        unet=unet_256(camera_mode="cameractrl"),
        pose_encoder=POSE_ENCODER_256,
        camera_embedding="ray",
        loss_type="l2",
        **_DIFFUSION_256,
    )


def cami2v_256() -> CamI2VConfig:
    return CamI2VConfig(
        unet=unet_256(use_camera=True, epipolar=EPIPOLAR_256, add_type="add_into_temporal_attn"),
        pose_encoder=POSE_ENCODER_256,
        epipolar=EPIPOLAR_256,
        add_type="add_into_temporal_attn",
        loss_type="l2",
        **_DIFFUSION_256,
    )


def camcontexti2v_256() -> CamContextI2VConfig:
    """reference: configs/models/camcontexti2v_256.yaml (the paper's model)."""
    return CamContextI2VConfig(
        unet=unet_256(use_camera=True, epipolar=EPIPOLAR_256, add_type="add_to_main_branch"),
        pose_encoder=POSE_ENCODER_256,
        epipolar=EPIPOLAR_256,
        add_type="add_to_main_branch",
        multi_cond_strategy="token_concat_latent_epipolar",
        adaptor=AdaptorConfig(
            query_dim=512, num_queries=1024, video_length=16, embedding_dim=4,
            output_dim=4, depth=12, timestep_embedding_type="sinusoidal_embedded",
            use_plucker_embedding=False,
        ),
        use_cross_normalization=False,
        use_zero_conv_latent_input=True,
        use_semantic_branch=True,
        loss_type="l2_log",
        **_DIFFUSION_256,
    )


PRESETS = {
    "dynamicrafter_256": dynamicrafter_256,
    "motionctrl_256": motionctrl_256,
    "cameractrl_256": cameractrl_256,
    "cami2v_256": cami2v_256,
    "camcontexti2v_256": camcontexti2v_256,
}
