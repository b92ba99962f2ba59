"""Reference-YAML -> dataclass-config bridge.

Keeps the reference's three-section config files (model / data / lightning,
reference: configs/models/camcontexti2v_256.yaml, main/trainer.py:64-69) as
the user-facing format: the same `target:` dotted paths and `params:` keys are
accepted and translated onto this framework's frozen dataclass configs and
model classes. CLI dotlist overrides merge last, mirroring OmegaConf usage.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import yaml

from camc2v_tpu.camera.pose_encoder import PoseEncoderConfig
from camc2v_tpu.models.camcontexti2v import AdaptorConfig, CamContextI2V, CamContextI2VConfig
from camc2v_tpu.models.camera_base import (
    CamI2V,
    CamI2VConfig,
    CameraControlConfig,
    CameraCtrl,
    MotionCtrl,
    MotionCtrlConfig,
)
from camc2v_tpu.models.dynamicrafter import DynamiCrafter, DynamiCrafterConfig, ResamplerConfig
from camc2v_tpu.nn.clip import CLIPTextConfig, CLIPVisionConfig
from camc2v_tpu.nn.epipolar import EpipolarConfig
from camc2v_tpu.nn.unet3d import UNetConfig
from camc2v_tpu.nn.vae import VAEConfig
from camc2v_tpu.parallel.trainer import TrainConfig

MODEL_CLASSES = {
    "model.camcontexti2v.CamContextI2V": (CamContextI2V, CamContextI2VConfig),
    "model.dynamicrafter.DynamiCrafter": (DynamiCrafter, DynamiCrafterConfig),
    "baseline.motionctrl.motionctrl.MotionCtrl": (MotionCtrl, MotionCtrlConfig),
    "baseline.cameractrl.cameractrl.CameraCtrl": (CameraCtrl, CameraControlConfig),
    "baseline.cami2v.cami2v.CamI2V": (CamI2V, CamI2VConfig),
    # short names
    "CamContextI2V": (CamContextI2V, CamContextI2VConfig),
    "DynamiCrafter": (DynamiCrafter, DynamiCrafterConfig),
    "MotionCtrl": (MotionCtrl, MotionCtrlConfig),
    "CameraCtrl": (CameraCtrl, CameraControlConfig),
    "CamI2V": (CamI2V, CamI2VConfig),
}


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def apply_dotlist(cfg: dict, overrides: list[str]) -> dict:
    """'a.b.c=value' CLI overrides, OmegaConf-style."""
    for item in overrides:
        key, _, raw = item.partition("=")
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(raw)
    return cfg


def _unet_config(p: dict) -> UNetConfig:
    known = dict(
        in_channels=p.get("in_channels", 8),
        out_channels=p.get("out_channels", 4),
        model_channels=p.get("model_channels", 320),
        num_res_blocks=p.get("num_res_blocks", 2),
        attention_resolutions=tuple(p.get("attention_resolutions", (4, 2, 1))),
        dropout=p.get("dropout", 0.0),
        channel_mult=tuple(p.get("channel_mult", (1, 2, 4, 4))),
        num_heads=p.get("num_heads", -1),
        num_head_channels=p.get("num_head_channels", 64),
        transformer_depth=p.get("transformer_depth", 1),
        context_dim=p.get("context_dim", 1024),
        temporal_conv=p.get("temporal_conv", True),
        tempspatial_aware=p.get("tempspatial_aware", False),
        temporal_attention=p.get("temporal_attention", True),
        temporal_selfatt_only=p.get("temporal_selfatt_only", True),
        use_relative_position=p.get("use_relative_position", False),
        use_causal_attention=p.get("use_causal_attention", False),
        temporal_length=p.get("temporal_length", 16),
        addition_attention=p.get("addition_attention", False),
        image_cross_attention=p.get("image_cross_attention", False),
        image_cross_attention_scale_learnable=p.get("image_cross_attention_scale_learnable", False),
        default_fs=p.get("default_fs", 4),
        fs_condition=p.get("fs_condition", False),
        use_scale_shift_norm=p.get("use_scale_shift_norm", False),
        resblock_updown=p.get("resblock_updown", False),
    )
    return UNetConfig(**known)


def _vae_config(p: dict) -> VAEConfig:
    dd = p.get("ddconfig", {})
    return VAEConfig(
        double_z=dd.get("double_z", True),
        z_channels=dd.get("z_channels", 4),
        resolution=dd.get("resolution", 256),
        in_channels=dd.get("in_channels", 3),
        out_ch=dd.get("out_ch", 3),
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=tuple(dd.get("attn_resolutions", ())),
        dropout=dd.get("dropout", 0.0),
        embed_dim=p.get("embed_dim", 4),
    )


def _epipolar_config(p: Optional[dict]) -> Optional[EpipolarConfig]:
    if p is None:
        return None
    return EpipolarConfig(
        origin_h=p.get("origin_h", 256),
        origin_w=p.get("origin_w", 256),
        is_3d_full_attn=p.get("is_3d_full_attn", False),
        num_register_tokens=p.get("num_register_tokens", 0),
        attention_resolution=tuple(p.get("attention_resolution", (8, 4, 2, 1))),
        compression_factor=p.get("compression_factor", 1),
        only_on_cond_frame=p.get("only_on_cond_frame", False),
        apply_epipolar_soft_mask=p.get("apply_epipolar_soft_mask", False),
        epipolar_hybrid_attention=p.get("epipolar_hybrid_attention", False),
        epipolar_hybrid_attention_v2=p.get("epipolar_hybrid_attention_v2", False),
        only_self_pixel_on_current_frame=p.get("only_self_pixel_on_current_frame", False),
        current_frame_as_register_token=p.get("current_frame_as_register_token", False),
        add_small_perturbation_on_zero_T=p.get("add_small_perturbation_on_zero_T", False),
        pluker_add_type=p.get("pluker_add_type", "add_to_pre_x_only"),
    )


def _pose_encoder_config(node: Optional[dict]) -> Optional[PoseEncoderConfig]:
    if node is None:
        return None
    p = node.get("params", node)
    return PoseEncoderConfig(
        downscale_factor=p.get("downscale_factor", 8),
        channels=tuple(p.get("channels", (320, 640, 1280, 1280))),
        nums_rb=p.get("nums_rb", 2),
        cin=p.get("cin", 384),
        ksize=p.get("ksize", 3),
        sk=p.get("sk", False),
        use_conv=p.get("use_conv", True),
        compression_factor=p.get("compression_factor", 1),
        temporal_attention_nhead=p.get("temporal_attention_nhead", 8),
        temporal_position_encoding=p.get("temporal_position_encoding", False),
        temporal_position_encoding_max_len=p.get("temporal_position_encoding_max_len", 16),
    )


def _resampler_config(node: Optional[dict]) -> ResamplerConfig:
    if node is None:
        return ResamplerConfig()
    p = node.get("params", node)
    return ResamplerConfig(
        dim=p.get("dim", 1024),
        depth=p.get("depth", 4),
        dim_head=p.get("dim_head", 64),
        heads=p.get("heads", 12),
        num_queries=p.get("num_queries", 16),
        embedding_dim=p.get("embedding_dim", 1280),
        output_dim=p.get("output_dim", 1024),
        ff_mult=p.get("ff_mult", 4),
        video_length=p.get("video_length", 16),
        use_timestep_emb=p.get("use_timestep_emb", False),
    )


def _adaptor_config(node: Optional[dict]) -> AdaptorConfig:
    if node is None:
        return AdaptorConfig()
    p = node.get("params", node)
    return AdaptorConfig(
        query_dim=p.get("query_dim", 512),
        num_queries=p.get("num_queries", 1024),
        video_length=p.get("video_length", 16),
        embedding_dim=p.get("embedding_dim", 4),
        output_dim=p.get("output_dim", 4),
        depth=p.get("depth", 12),
        dim_head=p.get("dim_head", 64),
        heads=p.get("heads", 8),
        ff_mult=p.get("ff_mult", 4),
        num_register_tokens=p.get("num_register_tokens", 2),
        use_mask=p.get("use_mask", True),
        timestep_embedding_type=p.get("timestep_embedding_type", "none"),
        timestep_embedding_dim=p.get("timestep_embedding_dim", 32),
        use_plucker_embedding=p.get("use_plucker_embedding", False),
    )


def build_model_from_config(cfg: dict, dtype=None):
    """(model_instance, pretrained_checkpoint_path) from the `model:` section."""
    import jax.numpy as jnp

    dtype = dtype if dtype is not None else jnp.bfloat16
    mnode = cfg["model"]
    target = mnode.get("target", "model.camcontexti2v.CamContextI2V")
    if target not in MODEL_CLASSES:
        raise KeyError(f"unknown model target '{target}'")
    model_cls, cfg_cls = MODEL_CLASSES[target]
    p = mnode.get("params", {})

    # non-reference extension: tiny/test tower overrides (reference configs
    # always use the full ViT-H towers via cond_stage_config targets)
    ct = p.get("clip_text_config", {})
    cv = p.get("clip_vision_config", {})
    kw: dict[str, Any] = dict(
        unet=_unet_config(p.get("unet_config", {}).get("params", {})),
        vae=_vae_config(p.get("first_stage_config", {}).get("params", {})),
        clip_text=CLIPTextConfig(**ct) if ct else CLIPTextConfig(),
        clip_vision=CLIPVisionConfig(**cv) if cv else CLIPVisionConfig(),
        resampler=_resampler_config(p.get("image_proj_stage_config")),
        timesteps=p.get("timesteps", 1000),
        beta_schedule=p.get("beta_schedule", "linear"),
        linear_start=p.get("linear_start", 1e-4),
        linear_end=p.get("linear_end", 2e-2),
        rescale_betas_zero_snr=p.get("rescale_betas_zero_snr", False),
        parameterization=p.get("parameterization", "eps"),
        scale_factor=p.get("scale_factor", 0.18215),
        loss_type=p.get("loss_type", "l2"),
        uncond_prob=p.get("uncond_prob", 0.05),
        uncond_type=p.get("uncond_type", "empty_seq"),
        rand_cond_frame=p.get("rand_cond_frame", False),
        fps_condition_type=p.get("fps_condition_type", "fs"),
        use_dynamic_rescale=p.get("use_dynamic_rescale", False),
        base_scale=p.get("base_scale", 0.7),
        turning_step=p.get("turning_step", 400),
        perframe_ae=p.get("perframe_ae", False),
        interp_mode=p.get("interp_mode", False),
    )

    if issubclass(cfg_cls, CameraControlConfig):
        kw["pose_encoder"] = _pose_encoder_config(p.get("pose_encoder_config"))
        kw["normalize_T0"] = p.get("normalize_T0", False)
        kw["camera_embedding"] = p.get("camera_embedding", "plucker")
    epipolar = _epipolar_config(p.get("epipolar_config"))
    if issubclass(cfg_cls, CamI2VConfig):
        kw["epipolar"] = epipolar
        kw["add_type"] = p.get("add_type", "add_into_temporal_attn")
    if cfg_cls is CamContextI2VConfig:
        kw["multi_cond_strategy"] = p.get("multi_cond_strategy")
        kw["adaptor"] = _adaptor_config(p.get("multi_latent_adaptor"))
        kw["use_cross_normalization"] = p.get("use_cross_normalization", False)
        kw["cross_normalization_mode"] = p.get("cross_normalization_mode", "spatio_temporal")
        kw["use_zero_conv_latent_input"] = p.get("use_zero_conv_latent_input", False)
        kw["use_semantic_branch"] = p.get("use_semantic_branch", True)
        kw["epipolar_mask_freeze_steps"] = p.get("epipolar_mask_freeze_steps")

    # wire camera composition into the UNet
    unet = kw["unet"]
    if cfg_cls is MotionCtrlConfig:
        unet = UNetConfig(**{**unet.__dict__, "camera_mode": "motionctrl", "pose_dim": p.get("pose_dim", 12)})
    elif cfg_cls is CameraControlConfig and model_cls is CameraCtrl:
        unet = UNetConfig(**{**unet.__dict__, "camera_mode": "cameractrl"})
    elif issubclass(cfg_cls, CamI2VConfig):
        unet = UNetConfig(
            **{
                **unet.__dict__,
                "use_camera": p.get("pose_encoder_config") is not None,
                "epipolar": epipolar,
                "add_type": kw.get("add_type", "add_into_temporal_attn"),
            }
        )
    kw["unet"] = unet

    model_config = cfg_cls(**kw)
    return model_cls(model_config, dtype=dtype), mnode.get("pretrained_checkpoint")


def build_train_config(cfg: dict, num_devices: int = 1) -> TrainConfig:
    mnode = cfg.get("model", {})
    lightning = cfg.get("lightning", {}).get("trainer", {})
    p = mnode.get("params", {})
    patterns = []
    # reference trainable-selection flags -> param-path regexes
    if p.get("multi_cond_adaptor_trainable", False):
        patterns.append(r"^adaptor/")
    if p.get("image_proj_model_trainable", False):
        patterns.append(r"^image_proj/")
    if p.get("pose_encoder_trainable", False):
        patterns.append(r"^pose_encoder/")
    if p.get("use_zero_conv_latent_input", False):
        patterns.append(r"^zero_conv/")
    if p.get("plucker_proj_trainable", False):
        patterns.append(r"pluker_projection")
    if p.get("epipolar_attn_trainable", False):
        patterns.append(r"/epipolar/")
    if p.get("cond_stage_trainable", False):
        patterns.append(r"^clip_text/")
    target = mnode.get("target", "")
    if "motionctrl" in target.lower() or "cameractrl" in target.lower():
        # the injected cc_projection adapters are always trainable in the
        # reference (baseline/motionctrl/motionctrl.py:49, cameractrl.py:49)
        patterns.append(r"cc_projection")
    for name in p.get("diffusion_model_trainable_param_list", []) or []:
        if name == "TemporalTransformer.attn1":
            patterns.append(r"temporal/block_\d+/attn1/")
        elif name == "TemporalTransformer.attn2":
            patterns.append(r"temporal/block_\d+/attn2/")
        elif name == "SpatialTransformer":
            patterns.append(r"_spatial/")
        elif name:
            patterns.append(re.escape(name))
    if not patterns:
        patterns = [r"^unet/"]  # DynamiCrafter default: train the UNet

    # reference `precision: "16-mixed"` (configs/models/camcontexti2v_256.yaml:209)
    # = half-precision non-master weights; TPU analogue is bf16 frozen params
    # with fp32 masters kept only for the trainable subset.
    precision = str(lightning.get("precision", "32") or "32")
    frozen_dtype = "bfloat16" if ("16" in precision and precision != "32") else None

    # strategy mapping: deepspeed_stage_1 (the reference recipe) = sharded
    # optimizer state only (always on); stage_2/3 or fsdp additionally shard
    # the params themselves over `data` (the FSDP analogue).
    strategy = str(lightning.get("strategy", "") or "")
    shard_params = any(k in strategy for k in ("stage_2", "stage_3", "fsdp"))

    return TrainConfig(
        learning_rate=mnode.get("base_learning_rate", 1e-4),
        scale_lr=mnode.get("scale_lr", False),
        weight_decay=p.get("weight_decay", 1e-2),
        grad_clip=lightning.get("gradient_clip_val", 0.5),
        accumulate_grad_batches=lightning.get("accumulate_grad_batches", 1),
        use_ema=p.get("use_ema", False),
        trainable_patterns=tuple(patterns),
        shard_params=shard_params,
        max_steps=lightning.get("max_steps", 50000),
        frozen_param_dtype=frozen_dtype,
    )


