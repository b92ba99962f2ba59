"""DynamiCrafter-style 3D UNet (flax.linen, channels-last, jit-static structure).

TPU-native rebuild of the reference UNetModel
(reference: CamContextI2V/lvdm/modules/networks/openaimodel3d.py:281-624) plus
the camera-conditioned forward that the reference installs by monkey-patching
(model/modules/modified_forwards.py:29-131). Here the camera hooks (per-level
Plücker-feature projection + epipolar attention inside every temporal block)
are ordinary config-driven submodules: `UNetConfig.use_camera` /
`UNetConfig.epipolar` / `UNetConfig.add_type`.

Data layout: x is (B, T, h, w, C) latents. Spatial stages run frame-wise on
(B*T, h, w, C); temporal stages on (B, T, h, w, C). Context rearrangement
(per-frame image tokens vs. broadcast text tokens, the reference's
`77 + t*16` split) happens once at the top of the forward.

Camera payload: a plain dict pytree
  {"plucker": (feat_ds1, feat_ds2, feat_ds4, feat_ds8) each (B,T,h_l,w_l,C_l),
   "masks": {8: (B,L,L), 16: ..., 32: ..., 64: ...},
   "cond_frame_index": (B,) int32}
The reference's `is_uc` flag is accepted and ignored — it is dead in the
reference too (Epipolar.forward swallows it via **kwargs).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from camc2v_tpu.core.schedules import timestep_embedding
from camc2v_tpu.nn.epipolar import EpipolarConfig
from camc2v_tpu.nn.layers import (
    Conv,
    Downsample,
    Dtype,
    GroupNorm32,
    ResBlock,
    TimestepEmbedMLP,
    Upsample,
)
from camc2v_tpu.nn.attention import SpatialTransformer, TemporalTransformer


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Static structural config (hashable; mirrors the reference ctor params)."""

    in_channels: int = 8
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: tuple[int, ...] = (4, 2, 1)
    dropout: float = 0.0
    channel_mult: tuple[int, ...] = (1, 2, 4, 4)
    conv_resample: bool = True
    context_dim: Optional[int] = 1024
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    num_heads: int = -1
    num_head_channels: int = 64
    transformer_depth: int = 1
    temporal_conv: bool = True
    tempspatial_aware: bool = False
    temporal_attention: bool = True
    temporal_selfatt_only: bool = True
    use_relative_position: bool = False
    use_causal_attention: bool = False
    temporal_length: int = 16
    addition_attention: bool = True
    image_cross_attention: bool = True
    image_cross_attention_scale_learnable: bool = False
    default_fs: int = 3
    fs_condition: bool = True
    text_context_len: int = 77
    img_tokens_per_frame: int = 16
    # --- camera composition (replaces the reference's monkey-patch cascade) ---
    use_camera: bool = False  # add zero-init pluker_projection to temporal blocks
    epipolar: Optional[EpipolarConfig] = None
    add_type: str = "add_to_main_branch"
    camera_mode: str = "plucker_epipolar"  # or "motionctrl" / "cameractrl"
    pose_dim: int = 12
    # rematerialise blocks in the training backward (flagship OOMs without);
    # no effect on inference (gated on deterministic=False)
    remat: bool = True
    # selective-checkpoint policy for the block remat (r5 train-step attack):
    #   None/"none"  save nothing — recompute every block forward (reference
    #                `checkpoint: true` semantics, lvdm/common.py:81-94)
    #   "dots"       jax.checkpoint_policies.dots_with_no_batch_dims_saveable —
    #                keep matmul outputs (attn projections, FFs), recompute
    #                elementwise/norm/softmax chains only
    #   "dots_batch" dots_saveable (also batched dots, e.g. attention scores)
    #   "pallas"     save Pallas custom-call outputs (flash/epipolar/temporal
    #                /FF kernel outs AND their lse residuals — verified with
    #                print_saved_residuals that partial-eval sees through the
    #                custom_vjp fwd), recompute everything else: no kernel
    #                fwd ever re-runs in the backward
    #   "dots_pallas" union of "dots" and "pallas"
    # env override for A/B harnesses: CAMC2V_REMAT_POLICY
    remat_policy: Optional[str] = None

    def heads_for(self, ch: int) -> tuple[int, int]:
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels


def _remat_policy(name: Optional[str]):
    """Resolve a UNetConfig.remat_policy name (env override:
    CAMC2V_REMAT_POLICY) to a jax.checkpoint policy, or None = save nothing."""
    import os

    name = os.environ.get("CAMC2V_REMAT_POLICY", name or "none")
    if name in (None, "", "none"):
        return None
    pols = jax.checkpoint_policies

    def pallas_saveable(prim, *_, **__):
        # Pallas kernels lower to this primitive; marking it saveable makes
        # partial-eval store the kernels' outputs AND the (out, lse) residuals
        # their custom_vjp fwds produce, so no kernel forward re-runs in the
        # backward (the r5 train profile attributed ~58 ms/step to exactly
        # those re-runs: 15 epipolar fwd(+lse) + 12 flash fwd under remat).
        return prim.name == "pallas_call"

    if name == "dots":
        return pols.dots_with_no_batch_dims_saveable
    if name == "dots_batch":
        return pols.dots_saveable
    if name == "pallas":
        return pallas_saveable
    if name == "dots_pallas":
        return pols.save_from_both_policies(
            pols.dots_with_no_batch_dims_saveable, pallas_saveable)
    raise ValueError(
        f"unknown remat policy {name!r} "
        "(none | dots | dots_batch | pallas | dots_pallas)")


class UNetModel(nn.Module):
    """The 3D UNet. Call: (x, timesteps, context, fs, camera) -> eps/v prediction."""

    config: UNetConfig
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        cfg = self.config
        ch = cfg.model_channels
        time_embed_dim = ch * 4
        self.time_embed = TimestepEmbedMLP(time_embed_dim, dtype=self.dtype, name="time_embed")
        if cfg.fs_condition:
            self.fps_embedding = TimestepEmbedMLP(
                time_embed_dim, zero_init_final=True, dtype=self.dtype, name="fps_embedding"
            )

        def spatial(ch_, ds, name):
            n_heads, d_head = cfg.heads_for(ch_)
            return SpatialTransformer(
                in_channels=ch_,
                n_heads=n_heads,
                d_head=d_head,
                depth=cfg.transformer_depth,
                context_dim=cfg.context_dim,
                video_length=cfg.temporal_length,
                image_cross_attention=cfg.image_cross_attention,
                image_cross_attention_scale_learnable=cfg.image_cross_attention_scale_learnable,
                dtype=self.dtype,
                name=name,
            )

        def temporal(ch_, ds, name, with_camera=True):
            n_heads, d_head = cfg.heads_for(ch_)
            # The reference camera patch cascade skips temporal blocks whose
            # inner dim equals init_attn's proj_in width (8 * num_head_channels)
            # — an identity test meant to exclude init_attn itself that also
            # excludes any LEVEL with ch == 8*num_head_channels (reference
            # model/camcontexti2v.py:143, baseline/cami2v/cami2v.py:64,
            # baseline/cameractrl/cameractrl.py:38). No shipped flagship level
            # collides (320/640/1280 vs 512), but config parity requires it.
            if cfg.addition_attention and n_heads * d_head == 8 * cfg.num_head_channels:
                with_camera = False
            return TemporalTransformer(
                in_channels=ch_,
                n_heads=n_heads,
                d_head=d_head,
                depth=cfg.transformer_depth,
                only_self_att=cfg.temporal_selfatt_only,
                context_dim=cfg.context_dim,
                causal_attention=cfg.use_causal_attention,
                relative_position=cfg.use_relative_position,
                temporal_length=cfg.temporal_length,
                use_camera=cfg.use_camera and with_camera,
                epipolar=cfg.epipolar if with_camera else None,
                add_type=cfg.add_type,
                camera_mode=cfg.camera_mode,
                pose_dim=cfg.pose_dim,
                dtype=self.dtype,
                name=name,
            )

        def resblock(out_ch, name, up=False, down=False, temporal_conv=None):
            return ResBlock(
                out_channels=out_ch,
                dropout=cfg.dropout,
                use_scale_shift_norm=cfg.use_scale_shift_norm,
                up=up,
                down=down,
                use_temporal_conv=cfg.temporal_conv if temporal_conv is None else temporal_conv,
                dtype=self.dtype,
                name=name,
            )

        self.conv_in = Conv(ch, (3, 3), dtype=self.dtype, name="conv_in")
        if cfg.addition_attention:
            # reference: init_attn with fixed 8 heads x num_head_channels (inner 512).
            # MotionCtrl is the one camera variant whose patch cascade has no
            # init_attn exclusion AND whose patched unet forward passes the
            # camera payload into init_attn (motionctrl_modified_modules.py:69),
            # so its cc_projection lives in init_attn blocks too.
            self.init_attn = TemporalTransformer(
                in_channels=ch,
                n_heads=8,
                d_head=cfg.num_head_channels,
                depth=cfg.transformer_depth,
                only_self_att=cfg.temporal_selfatt_only,
                context_dim=cfg.context_dim,
                causal_attention=False,
                relative_position=cfg.use_relative_position,
                temporal_length=cfg.temporal_length,
                use_camera=False,
                epipolar=None,
                camera_mode=cfg.camera_mode,
                pose_dim=cfg.pose_dim,
                dtype=self.dtype,
                name="init_attn",
            )

        # ---- encoder ----
        input_blocks: list[list] = []  # list of (kind, module) lists
        input_block_meta: list[dict] = []  # per block: {"ds": int}
        input_block_chans = [ch]
        ds = 1
        blk = 0
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                layers = [("res", resblock(mult * cfg.model_channels, f"in_{blk}_res"))]
                ch = mult * cfg.model_channels
                if ds in cfg.attention_resolutions:
                    layers.append(("spatial", spatial(ch, ds, f"in_{blk}_spatial")))
                    if cfg.temporal_attention:
                        layers.append(("temporal", temporal(ch, ds, f"in_{blk}_temporal")))
                input_blocks.append(layers)
                input_block_meta.append({"ds": ds})
                input_block_chans.append(ch)
                blk += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    layers = [("res", resblock(ch, f"in_{blk}_down", down=True, temporal_conv=False))]
                else:
                    layers = [("downsample", Downsample(ch, cfg.conv_resample, dtype=self.dtype, name=f"in_{blk}_down"))]
                input_blocks.append(layers)
                input_block_meta.append({"ds": ds})
                input_block_chans.append(ch)
                ds *= 2
                blk += 1
        self.input_blocks = input_blocks
        self.input_block_meta = input_block_meta

        # ---- middle ----
        mid = [("res", resblock(ch, "mid_res1")), ("spatial", spatial(ch, ds, "mid_spatial"))]
        if cfg.temporal_attention:
            mid.append(("temporal", temporal(ch, ds, "mid_temporal")))
        mid.append(("res", resblock(ch, "mid_res2")))
        self.middle_block = mid
        self.middle_ds = ds

        # ---- decoder ----
        output_blocks: list[list] = []
        output_block_meta: list[dict] = []
        blk = 0
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            for i in range(cfg.num_res_blocks + 1):
                ich = input_block_chans.pop()
                layers = [("res", resblock(mult * cfg.model_channels, f"out_{blk}_res"))]
                ch = cfg.model_channels * mult
                if ds in cfg.attention_resolutions:
                    layers.append(("spatial", spatial(ch, ds, f"out_{blk}_spatial")))
                    if cfg.temporal_attention:
                        layers.append(("temporal", temporal(ch, ds, f"out_{blk}_temporal")))
                output_block_meta.append({"ds": ds})
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        layers.append(("res", resblock(ch, f"out_{blk}_up", up=True, temporal_conv=False)))
                    else:
                        layers.append(("upsample", Upsample(ch, cfg.conv_resample, dtype=self.dtype, name=f"out_{blk}_up")))
                    ds //= 2
                output_blocks.append(layers)
                blk += 1
        self.output_blocks = output_blocks
        self.output_block_meta = output_block_meta

        self.out_norm = GroupNorm32(name="out_norm")
        self.out_conv = Conv(cfg.out_channels, (3, 3), zero_init=True, dtype=self.dtype, name="out_conv")

    def _camera_for(self, camera: Optional[dict], ds: int, use_last_plucker: bool = False) -> Optional[dict]:
        """Route the per-level Plücker feature pyramid by downsample factor.

        reference: modified_forwards.py:64-124 (log2(ds)-indexed routing).
        """
        if camera is None:
            return None
        out = dict(camera)
        plucker = camera.get("plucker")
        if plucker is not None:
            if use_last_plucker:
                out["plucker"] = plucker[-1]
            elif ds in self.config.attention_resolutions:
                out["plucker"] = plucker[int(math.log2(ds))]
            else:
                out["plucker"] = None
        return out

    def _apply_block(self, layers, h, emb, context, b, camera_level, deterministic, context_mask=None):
        # Training (deterministic=False) rematerialises each block in the
        # backward pass: without it the flagship value_and_grad keeps every
        # forward activation live (f32 masters 6 GB + bf16 cast 3 GB leave no
        # room on a 16 GB chip). Inference paths are untouched. Matches the
        # reference's torch checkpoint wrapping (lvdm/modules/networks/
        # openaimodel3d.py:109-279 via basics.py checkpoint).
        remat = self.config.remat and not deterministic
        policy = _remat_policy(self.config.remat_policy)

        def lift(fn):
            if not remat:
                return fn
            return nn.remat(fn, policy=policy) if policy is not None else nn.remat(fn)

        for kind, module in layers:
            if kind == "res":
                h = lift(lambda m, h_, e_: m(h_, e_, batch_size=b, deterministic=deterministic))(
                    module, h, emb
                )
            elif kind == "spatial":
                h = lift(
                    lambda m, h_, c_, cm_: m(
                        h_, context=c_, context_mask=cm_, deterministic=deterministic
                    )
                )(module, h, context, context_mask)
            elif kind == "temporal":
                n, hh, ww, c = h.shape
                t = n // b
                h5 = h.reshape(b, t, hh, ww, c)
                # the reference hands the same cross-attn context to temporal
                # transformers; it is only consumed when only_self_att=False
                # (openaimodel3d.py:36-48, attention.py:405-419)
                tctx = None if module.only_self_att else context
                h5 = lift(
                    lambda m, h_, c_, cam_: m(
                        h_, context=c_, camera=cam_, deterministic=deterministic
                    )
                )(module, h5, tctx, camera_level)
                h = h5.reshape(n, hh, ww, c)
            else:  # downsample / upsample
                h = module(h)
        return h

    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        fs: Optional[jax.Array] = None,
        camera: Optional[dict] = None,
        features_adapter: Optional[tuple] = None,
        *,
        context_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """x: (B, T, h, w, C_in); timesteps: (B,); context: (B, L, D); fs: (B,).

        context_mask: optional (B, L) bool token validity (padded context
        frames); threaded into the cross-attention image branch.
        """
        cfg = self.config
        b, t, hh, ww, _ = x.shape

        t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(self.dtype)
        emb = self.time_embed(t_emb)  # (B, 4*ch)

        # per-frame context: text tokens broadcast across frames, image tokens per frame
        l_ctx = context.shape[1]
        if l_ctx == cfg.text_context_len + t * cfg.img_tokens_per_frame:
            ctx_text = context[:, : cfg.text_context_len]
            ctx_img = context[:, cfg.text_context_len :].reshape(b, t, cfg.img_tokens_per_frame, -1)
            ctx_text = jnp.repeat(ctx_text[:, None], t, axis=1)  # (B, T, 77, D)
            context = jnp.concatenate([ctx_text, ctx_img], axis=2).reshape(b * t, -1, context.shape[-1])
            context_mask = None  # single-frame context is never padded
        else:
            context = jnp.repeat(context, t, axis=0)
            if context_mask is not None:
                if context_mask.ndim == 3:
                    # (B, T, L) per-frame token validity — the fused-CFG path
                    # expresses the uncond's per-frame token routing as a mask
                    # (dynamicrafter.py::_pad_uncond_for_fusion); sample-major
                    # frame-minor flatten matches the jnp.repeat above
                    context_mask = context_mask.astype(bool).reshape(b * t, l_ctx)
                else:
                    context_mask = jnp.repeat(context_mask.astype(bool), t, axis=0)
        context = context.astype(self.dtype)

        emb = jnp.repeat(emb, t, axis=0)  # (B*T, 4ch)
        if cfg.fs_condition:
            if fs is None:
                fs = jnp.full((b,), cfg.default_fs, dtype=jnp.int32)
            fs_emb = timestep_embedding(fs, cfg.model_channels).astype(self.dtype)
            fs_embed = self.fps_embedding(fs_emb)
            emb = emb + jnp.repeat(fs_embed, t, axis=0)

        h = x.reshape(b * t, hh, ww, x.shape[-1]).astype(self.dtype)
        h = self.conv_in(h)

        hs = []
        adapter_idx = 0
        # conv_in is the reference's input_blocks[0]; init_attn follows it
        if cfg.addition_attention:
            h5 = h.reshape(b, t, *h.shape[1:])
            init_cam = camera if cfg.camera_mode == "motionctrl" else None
            ictx = None if self.init_attn.only_self_att else context
            h5 = self.init_attn(h5, context=ictx, camera=init_cam, deterministic=deterministic)
            h = h5.reshape(b * t, *h.shape[1:])
        hs.append(h)

        for i, layers in enumerate(self.input_blocks):
            ds = self.input_block_meta[i]["ds"]
            cam = self._camera_for(camera, ds)
            h = self._apply_block(layers, h, emb, context, b, cam, deterministic, context_mask)
            # reference block ids are offset by 1 (conv_in is block 0)
            if ((i + 2) % 3 == 0) and features_adapter is not None:
                h = h + features_adapter[adapter_idx]
                adapter_idx += 1
            hs.append(h)

        cam = self._camera_for(camera, self.middle_ds, use_last_plucker=True)
        h = self._apply_block(self.middle_block, h, emb, context, b, cam, deterministic, context_mask)

        for i, layers in enumerate(self.output_blocks):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            ds = self.output_block_meta[i]["ds"]
            cam = self._camera_for(camera, ds)
            h = self._apply_block(layers, h, emb, context, b, cam, deterministic, context_mask)

        h = self.out_norm(h, silu=True)
        h = self.out_conv(h)
        return h.reshape(b, t, hh, ww, cfg.out_channels).astype(jnp.float32)

    def downwards_embed(
        self, x, timesteps, context, fs=None, camera=None, *, deterministic: bool = True
    ) -> list[jax.Array]:
        """Encoder-only pass returning the skip pyramid (reference:
        sample_down_emb_unet, model/camcontexti2v.py:817-837)."""
        cfg = self.config
        b, t, hh, ww, _ = x.shape
        t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(self.dtype)
        emb = jnp.repeat(self.time_embed(t_emb), t, axis=0)
        l_ctx = context.shape[1]
        if l_ctx == cfg.text_context_len + t * cfg.img_tokens_per_frame:
            ctx_text = jnp.repeat(context[:, None, : cfg.text_context_len], t, axis=1)
            ctx_img = context[:, cfg.text_context_len :].reshape(b, t, cfg.img_tokens_per_frame, -1)
            context = jnp.concatenate([ctx_text, ctx_img], axis=2).reshape(b * t, -1, context.shape[-1])
        else:
            context = jnp.repeat(context, t, axis=0)
        context = context.astype(self.dtype)
        if cfg.fs_condition:
            if fs is None:
                fs = jnp.full((b,), cfg.default_fs, dtype=jnp.int32)
            emb = emb + jnp.repeat(self.fps_embedding(timestep_embedding(fs, cfg.model_channels).astype(self.dtype)), t, axis=0)
        h = x.reshape(b * t, hh, ww, x.shape[-1]).astype(self.dtype)
        h = self.conv_in(h)
        if cfg.addition_attention:
            init_cam = camera if cfg.camera_mode == "motionctrl" else None
            ictx = None if self.init_attn.only_self_att else context
            h5 = self.init_attn(h.reshape(b, t, *h.shape[1:]), context=ictx, camera=init_cam, deterministic=deterministic)
            h = h5.reshape(b * t, *h.shape[1:])
        hs = [h]
        for i, layers in enumerate(self.input_blocks):
            cam = self._camera_for(camera, self.input_block_meta[i]["ds"])
            h = self._apply_block(layers, h, emb, context, b, cam, deterministic)
            hs.append(h)
        return hs
