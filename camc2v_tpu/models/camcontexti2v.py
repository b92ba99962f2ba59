"""CamContextI2V — the paper's model: camera control + multi-frame context.

reference: CamContextI2V/model/camcontexti2v.py:30-839. Adds, on top of CamI2V:
  * a SEMANTIC branch: CLIP+Resampler tokens of the conditioning frame AND the
    context frames concatenated into c_crossattn (multi_cond_strategy
    'token_concat*', reference :628-644, :405-441);
  * a LATENT branch: `MultiLatentEpipolarAdaptor` queries cross-attend over the
    [cond ‖ context] VAE latents (optionally epipolar-masked between target
    frames and context frames) to produce a per-frame c_concat, optionally
    cross-normalised or zero-conv-residual onto the repeated cond-frame latent
    (reference :316-381);
  * conditional epipolar masks between target and context cameras
    (reference :493-521);
  * the epipolar-mask freeze schedule (`adaptor_use_mask` runtime flag,
    reference :771-776).

Batch keys on top of CameraControlLVDM's:
  "cond_frames": (B, N, H, W, 3) context frames,  "RT_cond": (B, N, 4, 4).
N varies in [1, 4] (batch-consistent); each distinct N compiles its own
program — same re-trace behaviour as the reference's dynamic shapes. A
pad-to-max + mask variant is the planned TPU optimisation.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from camc2v_tpu.camera import geometry as G
from camc2v_tpu.camera.adaptors import MultiLatentEpipolarAdaptor, cross_normalization
from camc2v_tpu.models.camera_base import CamI2V, CamI2VConfig


@dataclasses.dataclass(frozen=True)
class AdaptorConfig:
    """Mirrors configs/models/camcontexti2v_256.yaml:141-152."""

    query_dim: int = 512
    num_queries: int = 1024
    video_length: int = 16
    embedding_dim: int = 4
    output_dim: int = 4
    depth: int = 12
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    num_register_tokens: int = 2
    use_mask: bool = True
    timestep_embedding_type: str = "sinusoidal_embedded"
    timestep_embedding_dim: int = 32
    use_plucker_embedding: bool = False


@dataclasses.dataclass(frozen=True)
class CamContextI2VConfig(CamI2VConfig):
    multi_cond_strategy: Optional[str] = "token_concat_latent_epipolar"
    adaptor: AdaptorConfig = AdaptorConfig()
    use_cross_normalization: bool = False
    cross_normalization_mode: str = "spatio_temporal"  # or "token"
    use_zero_conv_latent_input: bool = True
    use_semantic_branch: bool = True
    epipolar_mask_freeze_steps: Optional[int] = None
    add_type: str = "add_to_main_branch"


class CamContextI2V(CamI2V):
    def __init__(self, config: CamContextI2VConfig, dtype=jnp.bfloat16):
        super().__init__(config, dtype=dtype)
        if config.multi_cond_strategy == "pose_agent_enc":
            # Reject loudly rather than half-run: this strategy is a
            # NON-FUNCTIONAL stub in the reference — _get_multi_cond_func has
            # no pose_agent_enc branch (falls through to a warning + identity
            # lambda, camcontexti2v.py:642-644), self.pose_agent_enc is only
            # ever None (:60), so the pose-guided CrossAttention forwards
            # (modified_forwards.py:238-380) are never installed (:132 gate),
            # and the kwargs call at :430 raises TypeError on the identity
            # lambda. No pose-agent encoder class exists anywhere in the
            # reference; selecting it crashes the reference on the first
            # batch. See PARITY.md "known gaps".
            raise NotImplementedError(
                "multi_cond_strategy='pose_agent_enc' is a non-functional stub "
                "in the reference (crashes there on first use); not rebuilt"
            )
        self.adaptor = None
        if config.multi_cond_strategy in ("token_concat_latent", "token_concat_latent_epipolar"):
            a = config.adaptor
            self.adaptor = MultiLatentEpipolarAdaptor(
                query_dim=a.query_dim, depth=a.depth, dim_head=a.dim_head, heads=a.heads,
                num_queries=a.num_queries, embedding_dim=a.embedding_dim, output_dim=a.output_dim,
                ff_mult=a.ff_mult, num_register_tokens=a.num_register_tokens, use_mask=a.use_mask,
                video_length=a.video_length, use_plucker_embedding=a.use_plucker_embedding,
                timestep_embedding_type=a.timestep_embedding_type,
                timestep_embedding_dim=a.timestep_embedding_dim, dtype=dtype,
            )
        self.zero_conv = None
        if config.use_zero_conv_latent_input:
            self.zero_conv = nn.Conv(
                4, kernel_size=(3, 3, 3), padding="SAME",
                kernel_init=nn.initializers.zeros_init(), bias_init=nn.initializers.zeros_init(),
                dtype=dtype, param_dtype=jnp.float32,
            )

    def init_params(self, rng: jax.Array, image_hw: tuple[int, int] = (256, 256)) -> dict:
        cfg: CamContextI2VConfig = self.config
        k0, k1, k2 = jax.random.split(rng, 3)
        params = super().init_params(k0, image_hw)
        h, w = image_hw[0] // 8, image_hw[1] // 8
        if self.adaptor is not None:
            ctx_tokens = jnp.zeros((1, 2 * h * w, cfg.adaptor.embedding_dim))
            params["adaptor"] = self.adaptor.init(k1, ctx_tokens)["params"]
        if self.zero_conv is not None:
            params["zero_conv"] = self.zero_conv.init(
                k2, jnp.zeros((1, cfg.video_length, h, w, 4))
            )["params"]
        return params

    # ---------------------------------------------------------------- batch
    def prepare_batch(
        self,
        params: dict,
        batch: dict,
        rng: Optional[jax.Array] = None,
        *,
        random_uncond: bool = False,
        rand_cond_frame: Optional[bool] = None,
        cond_frame_index: Optional[jax.Array] = None,
        enable_camera_condition: bool = True,
        trace_scale_factor: float = 1.0,
        adaptor_use_mask: Optional[bool] = None,
        need_full_z: bool = True,
        prefetch_uncond: bool = False,
        inference: bool = False,
    ) -> tuple[jax.Array, dict]:
        """reference: model/camcontexti2v.py:280-491.

        need_full_z=False: generation fast path — only the conditioning frame
        and the context frames are VAE-encoded (1+N frames instead of T+N; the
        encoder is frame-wise so the kept latents are numerically identical).
        cond["origin_z0"] is None in this mode (see DynamiCrafter.prepare_batch).
        """
        cfg: CamContextI2VConfig = self.config
        video = batch["video"]
        b, t, H, W = video.shape[:4]
        keys = jax.random.split(rng, 4) if rng is not None else [None] * 4

        if cond_frame_index is None:
            rcf = cfg.rand_cond_frame if rand_cond_frame is None else rand_cond_frame
            if rcf and keys[2] is not None:
                cond_frame_index = jax.random.randint(keys[2], (b,), 0, cfg.video_length)
            else:
                cond_frame_index = jnp.zeros((b,), jnp.int32)

        camera = (
            self.camera_condition(params, batch, cond_frame_index, trace_scale_factor)
            if enable_camera_condition
            else None
        )

        cond_frames = batch.get("cond_frames")
        # pad-to-max support: (B, N) validity flags from the collate (padded
        # context slots hold zero frames / identity poses). With padding every
        # N in [1, max] shares ONE compiled program; validity masks make the
        # numerics exactly equal to the unpadded batch.
        ctx_valid = batch.get("cond_frames_valid")
        if ctx_valid is not None:
            ctx_valid = ctx_valid.astype(bool)
        strategy = cfg.multi_cond_strategy
        latent_strategies = ("token_concat_latent", "token_concat_latent_epipolar")

        take_frame = lambda arr, idx: jnp.take_along_axis(
            arr, idx.reshape(b, 1, 1, 1, 1), axis=1
        ).squeeze(1)

        if need_full_z:
            if cond_frames is not None and strategy in latent_strategies:
                x_all = jnp.concatenate([video, cond_frames], axis=1)
            else:
                x_all = video
            z_all = self.encode_first_stage(params, x_all, keys[0])
        else:
            raw_img = take_frame(video, cond_frame_index)  # (B, H, W, 3)
            if cond_frames is not None and strategy in latent_strategies:
                x_sel = jnp.concatenate([raw_img[:, None], cond_frames], axis=1)
            else:
                x_sel = raw_img[:, None]
            z_sel = self.encode_first_stage(params, x_sel, keys[0])

        if cond_frames is not None and strategy in latent_strategies:
            n_ctx = cond_frames.shape[1]
            if need_full_z:
                z = z_all[:, :t]
                z_add = z_all[:, t:]
                z_cond = take_frame(z, cond_frame_index)
            else:
                z_cond, z_add = z_sel[:, 0], z_sel[:, 1:]
                z = jnp.repeat(z_cond[:, None], t, axis=1)  # shape placeholder
            z_inp = jnp.concatenate([z_cond[:, None], z_add], axis=1)  # (B, 1+N, h, w, 4)
            hl, wl = z.shape[2:4]
            z_tokens = z_inp.reshape(b, (1 + n_ctx) * hl * wl, z.shape[-1])

            masking_on = cfg.adaptor.use_mask if adaptor_use_mask is None else adaptor_use_mask
            use_kernel_mask = False
            if (
                masking_on
                and strategy == "token_concat_latent_epipolar"
                and os.environ.get("CAMC2V_ADAPTOR_KERNEL", "1") == "1"
            ):
                from camc2v_tpu.nn.epipolar import EpipolarConfig, plain_epipolar
                from camc2v_tpu.ops import epipolar_flash as ef

                epi_cfg = cfg.epipolar if cfg.epipolar is not None else EpipolarConfig()
                hw = hl * wl
                lq_adapt = cfg.adaptor.num_queries * cfg.adaptor.video_length
                use_kernel_mask = (
                    plain_epipolar(epi_cfg)
                    and cfg.adaptor.num_queries == hw  # one query per latent pixel
                    and hw >= 256
                    and lq_adapt % ef.BLOCK_Q == 0
                    and (hw % ef.BLOCK_K == 0 or hw % 256 == 0)
                )

            if use_kernel_mask:
                # mask recomputed IN-KERNEL from the epipolar lines with
                # SUBTILE skipping — the materialised (B, 16K, 3K) bool mask +
                # dense-masked softmax was 65% of the 35-44 ms flagship adaptor
                # (docs/profiles r4 adaptor trace). Since r5 the TRAIN step
                # routes here too (VERDICT r4 #3): the kernel's custom VJP
                # (Pallas dq/dk+dv with in-kernel mask recompute) replaces the
                # dense-masked softmax + chunked lax.map backward inside the
                # 484 ms train call. Kill switch: CAMC2V_ADAPTOR_KERNEL=0.
                blk = ef.BLOCK_K if hw % ef.BLOCK_K == 0 else hw
                F_cond = G.conditional_fundamental(
                    batch["camera_intrinsics"], batch["RT"], batch["RT_cond"],
                    cond_frame_index,
                )
                adapt_lines = ef.epipolar_lines(F_cond, hl, wl, 8)
                if ctx_valid is not None:
                    # padded context frames: NaN lines make every distance
                    # comparison False — the exact F==0 semantics — so their
                    # keys are hidden AND their subtiles skipped; register
                    # tokens stay visible, matching the dense path's
                    # token-validity columns
                    fv = jnp.concatenate([jnp.ones((b, 1), bool), ctx_valid], axis=1)
                    adapt_lines = jnp.where(
                        fv[:, None, :, None], adapt_lines, jnp.nan
                    )
                adapt_tiles = ef.epipolar_tile_map(
                    adapt_lines, 1 + n_ctx, hl, wl, 8, block_q=ef.BLOCK_Q, block_k=blk
                )
                img_cat_cond = self.adaptor.apply(
                    {"params": params["adaptor"]}, z_tokens, None, use_mask=True,
                    lines=adapt_lines, geom=(1 + n_ctx, hl, wl, 8, blk),
                    tile_any=adapt_tiles,
                )  # (B, T*hw, 4)
            else:
                epi_mask = None
                if strategy == "token_concat_latent_epipolar" and cfg.adaptor.use_mask:
                    from camc2v_tpu.nn.epipolar import EpipolarConfig

                    epi_mask = G.conditional_epipolar_mask(
                        batch["camera_intrinsics"], batch["RT"], batch["RT_cond"],
                        cond_frame_index, H, W, downsample=8,
                        config=cfg.epipolar if cfg.epipolar is not None else EpipolarConfig(),
                    )

                eff_use_mask = adaptor_use_mask
                if ctx_valid is not None:
                    # validity columns: cond-frame tokens always visible, padded
                    # context frames never (freeze phases drop only the epipolar
                    # component, not the validity)
                    token_valid = jnp.concatenate(
                        [jnp.ones((b, 1), bool), ctx_valid], axis=1
                    )
                    token_valid = jnp.repeat(token_valid, hl * wl, axis=1)  # (B, (1+N)*hw)
                    lq_adapt = cfg.adaptor.num_queries * cfg.adaptor.video_length
                    use_epi = (
                        cfg.adaptor.use_mask if adaptor_use_mask is None else adaptor_use_mask
                    ) and epi_mask is not None
                    base = epi_mask if use_epi else jnp.ones((b, lq_adapt, z_tokens.shape[1]), bool)
                    epi_mask = base & token_valid[:, None, :]
                    eff_use_mask = True

                img_cat_cond = self.adaptor.apply(
                    {"params": params["adaptor"]}, z_tokens, epi_mask, use_mask=eff_use_mask
                )  # (B, T*hw, 4)
            original_cond = take_frame(z, cond_frame_index)  # (B, h, w, 4)

            if cfg.use_cross_normalization:
                if cfg.cross_normalization_mode == "spatio_temporal":
                    icc = img_cat_cond.reshape(b, t, hl, wl, 4)
                    icc = cross_normalization(icc, original_cond[:, None], axes=(-4, -3, -2))
                else:
                    icc = cross_normalization(
                        img_cat_cond[:, None], original_cond.reshape(b, hl * wl, 4)[:, None], axes=(-2, -1)
                    ).squeeze(1).reshape(b, t, hl, wl, 4)
                img_cat_cond = icc
            else:
                img_cat_cond = img_cat_cond.reshape(b, t, hl, wl, 4)

            if cfg.use_zero_conv_latent_input:
                img_cat_cond = self.zero_conv.apply({"params": params["zero_conv"]}, img_cat_cond)
                img_cat_cond = original_cond[:, None] + img_cat_cond
        else:
            if need_full_z:
                z = z_all
                z_cond = take_frame(z, cond_frame_index)
            else:
                z_cond = z_sel[:, 0]
                z = jnp.repeat(z_cond[:, None], t, axis=1)  # shape placeholder
            img_cat_cond = jnp.repeat(z_cond[:, None], t, axis=1)

        # ---------------- text + semantic image branch ----------------
        cond_emb, null_prompt = self.encode_text_with_null(params, batch["caption_tokens"])
        prompt_mask, input_mask = self.cfg_dropout_masks(keys[1] if random_uncond else None, b)
        prompt_emb = jnp.where(prompt_mask, null_prompt, jax.lax.stop_gradient(cond_emb))

        uc_img = None
        img = take_frame(video, cond_frame_index)
        if cfg.use_semantic_branch and cond_frames is not None:
            n_ctx = cond_frames.shape[1]
            imgs = jnp.concatenate([img[:, None], cond_frames], axis=1)  # (B, 1+N, H, W, 3)
            imgs = input_mask[:, None] * imgs  # (B,1,1,1,1) broadcast over frames
            imgs = imgs.reshape(b * (1 + n_ctx), H, W, 3)
            if prefetch_uncond:
                # one extra zero row rides along; build_uncond's zero-image
                # tower (single frame-set) comes out of THIS dispatch
                emb_all = self.embed_images(
                    params, jnp.concatenate([imgs, jnp.zeros_like(imgs[:1])], axis=0)
                )
                img_emb, uc_img = emb_all[:-1], emb_all[-1:]
            else:
                img_emb = self.embed_images(params, imgs)  # (B*(1+N), L, 1024)
            l_tok = img_emb.shape[1]
            img_emb = img_emb.reshape(b, (1 + n_ctx), l_tok, -1)
            if strategy in ("max", "avg") and ctx_valid is not None:
                fv = jnp.concatenate([jnp.ones((b, 1), bool), ctx_valid], axis=1)[:, :, None, None]
                if strategy == "max":
                    img_emb = jnp.max(jnp.where(fv, img_emb, -jnp.inf), axis=1)
                else:
                    img_emb = jnp.sum(jnp.where(fv, img_emb, 0.0), axis=1) / jnp.sum(
                        fv.astype(img_emb.dtype), axis=1
                    )
            elif strategy == "max":
                img_emb = jnp.max(img_emb, axis=1)
            elif strategy == "avg":
                img_emb = jnp.mean(img_emb, axis=1)
            else:  # token_concat family
                img_emb = img_emb.reshape(b, (1 + n_ctx) * l_tok, -1)
        else:
            img = input_mask * img
            if prefetch_uncond:
                emb_all = self.embed_images(
                    params, jnp.concatenate([img, jnp.zeros_like(img[:1])], axis=0)
                )
                img_emb, uc_img = emb_all[:b], emb_all[b:]
            else:
                img_emb = self.embed_images(params, img)

        cond: dict[str, Any] = {
            "c_concat": img_cat_cond,
            "c_cond_frame_index": cond_frame_index,
            "origin_z0": z if need_full_z else None,
            "c_crossattn": jnp.concatenate([prompt_emb, img_emb], axis=1),
        }
        if prefetch_uncond and uc_img is not None:
            cond["_uncond"] = {
                "img_emb": jnp.repeat(uc_img, b, axis=0),
                "prompt_emb": jnp.repeat(null_prompt, b, axis=0),
            }
        if ctx_valid is not None and cfg.use_semantic_branch and cond_frames is not None:
            # token-level validity for the UNet's image cross-attention branch
            n_ctx = cond_frames.shape[1]
            l_tok = img_emb.shape[1] // (1 + n_ctx)
            frame_valid = jnp.concatenate([jnp.ones((b, 1), bool), ctx_valid], axis=1)
            img_tok_valid = jnp.repeat(frame_valid, l_tok, axis=1)  # (B, (1+N)*l_tok)
            text_valid = jnp.ones((b, prompt_emb.shape[1]), bool)
            cond["c_crossattn_mask"] = jnp.concatenate([text_valid, img_tok_valid], axis=1)
        if camera is not None:
            cond["camera"] = camera
        return z, cond
