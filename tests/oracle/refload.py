"""Load the reference PyTorch models at tiny config + build matching JAX models.

Single source of truth for the oracle tiny configuration: T=4 frames, 32x32
video, 4x4 latents, model_channels=32, context_dim=16, 77 text + 16
image-tokens/frame (the reference UNet forward hardcodes the `77 + t*16`
context split, openaimodel3d.py:575).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REF_ROOT = "/root/reference/CamContextI2V"
ORACLE_DIR = str(Path(__file__).resolve().parent)
if ORACLE_DIR not in sys.path:
    sys.path.append(ORACLE_DIR)

from stubs import install_stubs  # noqa: E402

# ----------------------------------------------------------------- tiny dims
T = 4
IMG = 32
LAT = 4  # latent 4x4 (VAE /8)
CTX_DIM = 16
MODEL_CH = 32


class Dims:
    """Oracle model-size profile. `TINY` is the round-2 gate; `MID` (round 3)
    exercises what tiny structurally cannot: the flagship's 4-level
    channel_mult (1,2,4,4) ds routing (reference
    model/modules/modified_forwards.py:64-124 log2-indexed plucker pyramid),
    num_res_blocks=2 block bookkeeping, epipolar masks at 4 resolutions
    (model/camcontexti2v.py:525-572), register tokens = 4, and the PLAIN
    (production) epipolar config — no hybrid fallbacks — so the in-kernel
    mask path dispatches at ds8 exactly as the flagship does."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


TINY = Dims(
    T=4, IMG=32, LAT=4, CTX_DIM=16, MODEL_CH=32,
    channel_mult=[1, 3], attention_resolutions=[2, 1], num_res_blocks=1,
    epipolar_resolution=[2, 1], n_reg=2, pose_channels=[32, 96], nums_rb=1,
    plain_epipolar=False,
)
MID = Dims(
    T=16, IMG=128, LAT=16, CTX_DIM=16, MODEL_CH=32,
    channel_mult=[1, 2, 4, 4], attention_resolutions=[4, 2, 1], num_res_blocks=2,
    epipolar_resolution=[8, 4, 2, 1], n_reg=4, pose_channels=[32, 64, 128, 128],
    nums_rb=2, plain_epipolar=True,
)


class Cfg(dict):
    """dict with attribute access — stands in for OmegaConf DictConfig."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


def load_reference():
    """Install stubs, put the reference tree + the oracle dir on sys.path."""
    install_stubs()
    for p in (REF_ROOT, ORACLE_DIR):
        if p not in sys.path:
            sys.path.append(p)


# =================================================================== configs
def ref_unet_cfg(dims: Dims = TINY, **overrides) -> Cfg:
    params = Cfg(
        in_channels=8, out_channels=4, model_channels=dims.MODEL_CH,
        attention_resolutions=dims.attention_resolutions,
        num_res_blocks=dims.num_res_blocks, channel_mult=dims.channel_mult,
        dropout=0.0, num_head_channels=8, transformer_depth=1, context_dim=dims.CTX_DIM,
        use_linear=True, use_checkpoint=False, temporal_conv=True,
        temporal_attention=True, temporal_selfatt_only=True,
        use_relative_position=False, use_causal_attention=False,
        temporal_length=dims.T, addition_attention=True, image_cross_attention=True,
        image_cross_attention_scale_learnable=True, default_fs=3, fs_condition=True,
    )
    params.update(overrides)
    return Cfg(target="lvdm.modules.networks.openaimodel3d.UNetModel", params=params)


def ref_first_stage_cfg(dims: Dims = TINY) -> Cfg:
    return Cfg(
        target="lvdm.models.autoencoder.AutoencoderKL",
        params=Cfg(
            embed_dim=4,
            ddconfig=Cfg(
                double_z=True, z_channels=4, resolution=dims.IMG, in_channels=3,
                out_ch=3, ch=32, ch_mult=[1, 2, 4, 4], num_res_blocks=1,
                attn_resolutions=[], dropout=0.0,
            ),
            lossconfig=Cfg(target="torch.nn.Identity"),
        ),
    )


def ref_resampler_cfg(dims: Dims = TINY) -> Cfg:
    return Cfg(
        target="lvdm.modules.encoders.resampler.Resampler",
        params=Cfg(
            dim=32, depth=1, dim_head=8, heads=2, num_queries=16,
            embedding_dim=12, output_dim=dims.CTX_DIM, ff_mult=4, video_length=dims.T,
            use_timestep_emb=True,
        ),
    )


def ref_pose_encoder_cfg(dims: Dims = TINY) -> Cfg:
    return Cfg(
        target="model.modules.camera_pose_encoder.CameraPoseEncoder",
        params=Cfg(
            downscale_factor=8, channels=dims.pose_channels, nums_rb=dims.nums_rb,
            cin=384, ksize=1, sk=True, use_conv=False, compression_factor=1,
            temporal_attention_nhead=2, attention_block_types=["Temporal_Self"],
            temporal_position_encoding=True, temporal_position_encoding_max_len=dims.T,
        ),
    )


def ref_epipolar_cfg(dims: Dims = TINY) -> Cfg:
    return Cfg(
        origin_h=dims.IMG, origin_w=dims.IMG, is_3d_full_attn=False,
        num_register_tokens=dims.n_reg,
        attention_resolution=dims.epipolar_resolution, compression_factor=1,
        # TINY: perturbation off + hybrid fallbacks (see module docstring).
        # MID: the flagship PLAIN config; the test patches add_small_perturbation
        # to a deterministic well-conditioned offset on both sides.
        add_small_perturbation_on_zero_T=dims.plain_epipolar,
        epipolar_hybrid_attention=not dims.plain_epipolar,
    )


def ref_adaptor_cfg(dims: Dims = TINY) -> Cfg:
    return Cfg(
        target="model.modules.adaptors.MultiLatentEpipolarAdaptor",
        params=Cfg(
            query_dim=dims.CTX_DIM, num_queries=dims.LAT * dims.LAT, video_length=dims.T,
            embedding_dim=4,
            output_dim=4, depth=1, num_register_tokens=dims.n_reg,
            checkpoint=False, timestep_embedding_type="sinusoidal_embedded",
            use_plucker_embedding=False,
        ),
    )


def ref_common_params(dims: Dims = TINY) -> Cfg:
    return Cfg(
        timesteps=1000, linear_start=0.00085, linear_end=0.012,
        rescale_betas_zero_snr=False, parameterization="eps",
        num_timesteps_cond=1, loss_type="l2_log", conditioning_key="hybrid",
        image_size=[dims.LAT, dims.LAT], channels=4, scale_by_std=False, scale_factor=0.18215,
        use_ema=False, uncond_prob=0.05, uncond_type="empty_seq",
        rand_cond_frame=False, use_dynamic_rescale=False, base_scale=1.0,
        fps_condition_type="fs", perframe_ae=False,
        first_stage_key="video", cond_stage_key="caption",
        cond_stage_trainable=False, image_proj_model_trainable=True,
        first_stage_config=ref_first_stage_cfg(dims),
        cond_stage_config=Cfg(target="oracle_dummies.DummyTextEncoder", params=Cfg()),
        img_cond_stage_config=Cfg(target="oracle_dummies.DummyVisionEncoder", params=Cfg()),
        image_proj_stage_config=ref_resampler_cfg(dims),
    )


def build_ref_model(family: str, dims: Dims = TINY):
    """Instantiate the reference torch model for one of the 5 families."""
    load_reference()
    import torch

    torch.manual_seed(0)
    common = ref_common_params(dims)
    if family == "dynamicrafter":
        from model.dynamicrafter import DynamiCrafter as RefCls

        kwargs = dict(common, unet_config=ref_unet_cfg(dims))
    elif family == "motionctrl":
        from baseline.motionctrl.motionctrl import MotionCtrl as RefCls

        kwargs = dict(common, unet_config=ref_unet_cfg(dims), pose_dim=12)
    elif family == "cameractrl":
        from baseline.cameractrl.cameractrl import CameraCtrl as RefCls

        kwargs = dict(
            common, unet_config=ref_unet_cfg(dims),
            pose_encoder_config=ref_pose_encoder_cfg(dims),
            pose_encoder_trainable=False, camera_embedding="ray",
        )
    elif family == "cami2v":
        from baseline.cami2v.cami2v import CamI2V as RefCls

        kwargs = dict(
            common, unet_config=ref_unet_cfg(dims),
            pose_encoder_config=ref_pose_encoder_cfg(dims),
            pose_encoder_trainable=False,
            epipolar_config=ref_epipolar_cfg(dims),
            add_type="add_into_temporal_attn",
        )
    elif family == "camcontext":
        from model.camcontexti2v import CamContextI2V as RefCls

        kwargs = dict(
            common, unet_config=ref_unet_cfg(dims),
            pose_encoder_config=ref_pose_encoder_cfg(dims),
            pose_encoder_trainable=False,
            epipolar_config=ref_epipolar_cfg(dims),
            add_type="add_to_main_branch",
            multi_cond_strategy="token_concat_latent_epipolar",
            multi_latent_adaptor=ref_adaptor_cfg(dims),
            use_cross_normalization=False,
            use_zero_conv_latent_input=True,
            use_semantic_branch=True,
            multi_cond_adaptor_trainable=True,
        )
    else:
        raise ValueError(family)
    model = RefCls(**kwargs)
    model.eval()
    return model


# ============================================================ my-side configs
def my_model(family: str, dtype=None, dims: Dims = TINY):
    import jax.numpy as jnp

    from camc2v_tpu.camera.pose_encoder import PoseEncoderConfig
    from camc2v_tpu.models.camcontexti2v import (
        AdaptorConfig,
        CamContextI2V,
        CamContextI2VConfig,
    )
    from camc2v_tpu.models.camera_base import (
        CamI2V,
        CamI2VConfig,
        CameraControlConfig,
        CameraCtrl,
        MotionCtrl,
        MotionCtrlConfig,
    )
    from camc2v_tpu.models.dynamicrafter import (
        DynamiCrafter,
        DynamiCrafterConfig,
        ResamplerConfig,
    )
    from camc2v_tpu.nn.clip import CLIPTextConfig, CLIPVisionConfig
    from camc2v_tpu.nn.epipolar import EpipolarConfig
    from camc2v_tpu.nn.unet3d import UNetConfig
    from camc2v_tpu.nn.vae import VAEConfig

    dtype = dtype or jnp.float32

    def unet(**kw):
        base = dict(
            in_channels=8, out_channels=4, model_channels=dims.MODEL_CH,
            num_res_blocks=dims.num_res_blocks,
            attention_resolutions=tuple(dims.attention_resolutions),
            channel_mult=tuple(dims.channel_mult), num_head_channels=8,
            context_dim=dims.CTX_DIM, temporal_length=dims.T, addition_attention=True,
            image_cross_attention=True, image_cross_attention_scale_learnable=True,
            fs_condition=True, text_context_len=77, img_tokens_per_frame=16,
        )
        base.update(kw)
        return UNetConfig(**base)

    epi = EpipolarConfig(
        origin_h=dims.IMG, origin_w=dims.IMG,
        attention_resolution=tuple(dims.epipolar_resolution),
        num_register_tokens=dims.n_reg,
        add_small_perturbation_on_zero_T=dims.plain_epipolar,
        epipolar_hybrid_attention=not dims.plain_epipolar,
    )
    pose_enc = PoseEncoderConfig(
        downscale_factor=8, channels=tuple(dims.pose_channels), nums_rb=dims.nums_rb,
        cin=384, ksize=1, sk=True,
        use_conv=False, compression_factor=1, temporal_attention_nhead=2,
        temporal_position_encoding=True, temporal_position_encoding_max_len=dims.T,
    )
    base = dict(
        vae=VAEConfig(
            double_z=True, z_channels=4, resolution=dims.IMG, in_channels=3, out_ch=3,
            ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1, embed_dim=4,
        ),
        clip_text=CLIPTextConfig(vocab_size=64, context_length=77, width=16, heads=2, layers=1),
        clip_vision=CLIPVisionConfig(image_size=224, patch_size=112, width=16, heads=2, layers=1),
        resampler=ResamplerConfig(
            dim=32, depth=1, dim_head=8, heads=2, num_queries=16, embedding_dim=12,
            output_dim=dims.CTX_DIM, ff_mult=4, video_length=dims.T, use_timestep_emb=True,
        ),
        timesteps=1000, linear_start=0.00085, linear_end=0.012,
        scale_factor=0.18215, uncond_prob=0.05, loss_type="l2_log",
    )

    if family == "dynamicrafter":
        return DynamiCrafter(DynamiCrafterConfig(unet=unet(), **base), dtype=dtype)
    if family == "motionctrl":
        return MotionCtrl(MotionCtrlConfig(unet=unet(camera_mode="motionctrl"), **base), dtype=dtype)
    if family == "cameractrl":
        return CameraCtrl(
            CameraControlConfig(
                unet=unet(camera_mode="cameractrl"), pose_encoder=pose_enc,
                camera_embedding="ray", **base,
            ),
            dtype=dtype,
        )
    if family == "cami2v":
        return CamI2V(
            CamI2VConfig(
                unet=unet(use_camera=True, epipolar=epi, add_type="add_into_temporal_attn"),
                pose_encoder=pose_enc, epipolar=epi, add_type="add_into_temporal_attn", **base,
            ),
            dtype=dtype,
        )
    if family == "camcontext":
        return CamContextI2V(
            CamContextI2VConfig(
                unet=unet(use_camera=True, epipolar=epi, add_type="add_to_main_branch"),
                pose_encoder=pose_enc, epipolar=epi, add_type="add_to_main_branch",
                multi_cond_strategy="token_concat_latent_epipolar",
                # the reference adaptor hardcodes heads=8 x dim_head=64 (inner 512)
                # regardless of its ctor args (adaptors.py:101-106)
                adaptor=AdaptorConfig(
                    query_dim=dims.CTX_DIM, num_queries=dims.LAT * dims.LAT,
                    video_length=dims.T, embedding_dim=4,
                    output_dim=4, depth=1, dim_head=64, heads=8,
                    num_register_tokens=dims.n_reg,
                    timestep_embedding_type="sinusoidal_embedded", use_plucker_embedding=False,
                ),
                use_cross_normalization=False, use_zero_conv_latent_input=True,
                use_semantic_branch=True, **base,
            ),
            dtype=dtype,
        )
    raise ValueError(family)


# =============================================================== batch build
def make_batch(b: int = 1, n_ctx: int = 0, seed: int = 0, dims: Dims = TINY):
    """Canonical numpy batch; every pose pair gets a distinct translation so the
    epipolar masks are deterministic (no zero-T perturbation path)."""
    T, IMG = dims.T, dims.IMG
    rng = np.random.default_rng(seed)
    video = rng.uniform(-1, 1, (b, T, IMG, IMG, 3)).astype(np.float32)
    K = np.array([[IMG, 0, IMG / 2], [0, IMG, IMG / 2], [0, 0, 1]], np.float32)
    K = np.broadcast_to(K, (b, T, 3, 3)).copy()

    def rot_z(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    w2c = np.tile(np.eye(4, dtype=np.float32), (b, T, 1, 1))
    for i in range(T):
        w2c[:, i, :3, :3] = rot_z(0.05 * i)
        w2c[:, i, 0, 3] = 0.3 * i + 0.1
        w2c[:, i, 1, 3] = 0.07 * i * i
        w2c[:, i, 2, 3] = -0.11 * i

    batch = {
        "video": video,
        "caption": ["a scene"] * b,
        "frame_stride": np.full((b,), 3, np.int64),
        "camera_intrinsics": K,
        "RT": w2c,
    }
    if n_ctx:
        batch["cond_frames"] = rng.uniform(-1, 1, (b, n_ctx, IMG, IMG, 3)).astype(np.float32)
        w2c_c = np.tile(np.eye(4, dtype=np.float32), (b, n_ctx, 1, 1))
        for j in range(n_ctx):
            w2c_c[:, j, :3, :3] = rot_z(-0.04 * (j + 1))
            w2c_c[:, j, 0, 3] = -0.2 * (j + 1)
            w2c_c[:, j, 1, 3] = 0.15 + 0.05 * j
            w2c_c[:, j, 2, 3] = 0.09 * (j + 1)
        batch["RT_cond"] = w2c_c
    return batch


def to_torch_batch(batch: dict):
    import torch

    out = {
        "video": torch.from_numpy(batch["video"]).permute(0, 4, 1, 2, 3).contiguous(),
        "caption": batch["caption"],
        "frame_stride": torch.from_numpy(batch["frame_stride"]),
        "camera_intrinsics": torch.from_numpy(batch["camera_intrinsics"]),
        "RT": torch.from_numpy(batch["RT"]),
    }
    if "cond_frames" in batch:
        out["cond_frames"] = (
            torch.from_numpy(batch["cond_frames"]).permute(0, 1, 4, 2, 3).contiguous()
        )
        out["RT_cond"] = torch.from_numpy(batch["RT_cond"])
    return out


def to_jax_batch(batch: dict):
    import jax.numpy as jnp

    out = {
        "video": jnp.asarray(batch["video"]),
        "caption_tokens": jnp.zeros((len(batch["caption"]), 77), jnp.int32),
        "frame_stride": jnp.asarray(batch["frame_stride"], jnp.int32),
        "camera_intrinsics": jnp.asarray(batch["camera_intrinsics"]),
        "RT": jnp.asarray(batch["RT"]),
    }
    if "cond_frames" in batch:
        out["cond_frames"] = jnp.asarray(batch["cond_frames"])
        out["RT_cond"] = jnp.asarray(batch["RT_cond"])
    return out


# ============================================================== param import
def import_ref_params(ref_model, mine, my_params):
    """torch state_dict -> my params pytree via utils/torch_import.py."""
    from camc2v_tpu.utils.torch_import import import_state_dict

    sd = {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    new_params, report = import_state_dict(sd, my_params, mine.config.unet)
    return new_params, report


def patch_my_encoders(mine):
    """Replace my CLIP text/vision with the deterministic dummy twins."""
    import jax.numpy as jnp

    from oracle_dummies import jax_dummy_text, jax_dummy_vision

    mine.encode_text = lambda params, tokens: jax_dummy_text(tokens.shape[0])
    mine.null_text_embedding = lambda params, bs: jax_dummy_text(bs)
    mine.embed_images = lambda params, frames: mine.image_proj.apply(
        {"params": params["image_proj"]}, jax_dummy_vision(frames)
    ).astype(jnp.float32)
    return mine
