"""DynamiCrafter I2V latent-video-diffusion model (functional JAX assembly).

TPU-native rebuild of the reference model stack
(reference: CamContextI2V/lvdm/models/ddpm3d.py DDPM/LatentDiffusion/
LatentVisualDiffusion/DiffusionWrapper:41-1320 and model/dynamicrafter.py) as a
*composition*, not an inheritance tower: one `DynamiCrafter` object owns the
module set (UNet, VAE, CLIP text/image towers, Resampler), the frozen
`DiffusionSchedule`, and pure methods that thread an explicit `params` pytree.

Conditioning contract (the reference's `get_batch_input`, model/base.py:237-344):
  batch = {
    "video":          (B, T, H, W, 3) float in [-1, 1]
    "caption_tokens": (B, 77) int32 CLIP BPE ids
    "fs":             (B,) int32 frame-stride (fps_condition_type='fs')
  }
  cond = {
    "c_concat":       (B, T, h, w, 4) latent concat branch
    "c_crossattn":    (B, L, 1024) text+image tokens
    "origin_z0":      clean latents (for latent surgery)
    "cond_frame_index": (B,) int32
    "camera":         optional camera payload (camera models only)
  }

The 3-way CFG dropout (text-only 5% / image-only 5% / both 5%,
reference: ddpm3d.py:1075-1084, model/base.py:263-273) is driven by one
uniform draw per sample.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from camc2v_tpu.core import distributions as D
from camc2v_tpu.core.schedules import DDIMSchedule, DiffusionSchedule, extract, q_sample
from camc2v_tpu.models.sampler import (
    SamplerOptions,
    ddim_sample,
    dpmpp_2m_sample,
    p_sample_loop,
)
from camc2v_tpu.nn.clip import (
    CLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig,
    CLIPVisionTower,
    clip_preprocess,
)
from camc2v_tpu.nn.resampler import Resampler
from camc2v_tpu.nn.unet3d import UNetConfig, UNetModel
from camc2v_tpu.nn.vae import AutoencoderKL, VAEConfig

def empty_prompt_tokens(vocab_size: int, context_length: int) -> tuple[int, ...]:
    """CLIP BPE ids for the empty prompt: <sot>, <eot>, pad(0)...

    For the real vocab (49408) these are 49406/49407 — always the last two ids.
    """
    return (vocab_size - 2, vocab_size - 1) + (0,) * (context_length - 2)


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 1024
    ff_mult: int = 4
    video_length: Optional[int] = 16
    use_timestep_emb: bool = True


@dataclasses.dataclass(frozen=True)
class DynamiCrafterConfig:
    """Flagship defaults mirror configs/models/camcontexti2v_256.yaml."""

    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    clip_text: CLIPTextConfig = CLIPTextConfig()
    clip_vision: CLIPVisionConfig = CLIPVisionConfig()
    resampler: ResamplerConfig = ResamplerConfig()
    # diffusion
    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 0.00085
    linear_end: float = 0.012
    rescale_betas_zero_snr: bool = False
    parameterization: str = "eps"
    scale_factor: float = 0.18215
    loss_type: str = "l2"
    noise_strength: float = 0.0
    use_dynamic_rescale: bool = False
    base_scale: float = 0.7
    turning_step: int = 400
    # conditioning
    uncond_prob: float = 0.05
    uncond_type: str = "empty_seq"
    rand_cond_frame: bool = False
    fps_condition_type: str = "fs"
    interp_mode: bool = False
    perframe_ae: bool = False

    @property
    def video_length(self) -> int:
        return self.unet.temporal_length

    @property
    def latent_channels(self) -> int:
        return self.unet.out_channels


class DynamiCrafter:
    """Model assembly. All methods are pure given (params, inputs[, rng])."""

    def __init__(self, config: DynamiCrafterConfig, dtype=jnp.bfloat16):
        self.config = config
        self.dtype = dtype
        self.unet = UNetModel(config.unet, dtype=dtype)
        self.vae = AutoencoderKL(config.vae, dtype=dtype)
        self.clip_text = CLIPTextTower(config.clip_text, dtype=dtype)
        self.clip_vision = CLIPVisionTower(config.clip_vision, dtype=dtype)
        rs = config.resampler
        self.image_proj = Resampler(
            dim=rs.dim, depth=rs.depth, dim_head=rs.dim_head, heads=rs.heads,
            num_queries=rs.num_queries, embedding_dim=rs.embedding_dim,
            output_dim=rs.output_dim, ff_mult=rs.ff_mult, video_length=rs.video_length,
            use_timestep_emb=rs.use_timestep_emb, dtype=dtype,
        )
        self.schedule = DiffusionSchedule.create(
            timesteps=config.timesteps,
            beta_schedule=config.beta_schedule,
            linear_start=config.linear_start,
            linear_end=config.linear_end,
            rescale_betas_zero_snr=config.rescale_betas_zero_snr,
            parameterization=config.parameterization,
        )
        if config.use_dynamic_rescale:
            # reference ddpm3d.py:524-528: ramp 1.0 -> base_scale over the
            # first turning_step timesteps, then constant base_scale (the
            # concatenated tail is longer than num_timesteps but only the
            # first num_timesteps entries are ever gathered)
            import numpy as _np

            ramp = _np.linspace(1.0, config.base_scale, config.turning_step)
            rest = _np.full(config.timesteps, config.base_scale)
            self.scale_arr = jnp.asarray(
                _np.concatenate([ramp, rest])[: config.timesteps], jnp.float32
            )
        else:
            self.scale_arr = None

    # ------------------------------------------------------------------ init
    def init_params(self, rng: jax.Array, image_hw: tuple[int, int] = (256, 256)) -> dict:
        cfg = self.config
        H, W = image_hw
        h, w = H // 8, W // 8
        T = cfg.video_length
        keys = jax.random.split(rng, 5)
        z = jnp.zeros((1, T, h, w, cfg.unet.in_channels))
        l_ctx = cfg.unet.text_context_len + T * cfg.unet.img_tokens_per_frame
        ctx = jnp.zeros((1, l_ctx, cfg.unet.context_dim))
        # camera params only materialise on executed paths — init with a dummy
        # payload matching the model family (see example_camera_payload)
        cam = self.example_camera_payload(image_hw)
        params = {
            "unet": self.unet.init(
                keys[0], z, jnp.zeros((1,), jnp.int32), ctx, jnp.ones((1,), jnp.int32), cam
            )["params"],
            "vae": self.vae.init(keys[1], jnp.zeros((1, H, W, 3)))["params"],
            "clip_text": self.clip_text.init(keys[2], jnp.zeros((1, cfg.clip_text.context_length), jnp.int32))["params"],
            "clip_vision": self.clip_vision.init(
                keys[3], jnp.zeros((1, cfg.clip_vision.image_size, cfg.clip_vision.image_size, 3))
            )["params"],
            "image_proj": self.image_proj.init(
                keys[4], jnp.zeros((1, (cfg.clip_vision.image_size // cfg.clip_vision.patch_size) ** 2 + 1, cfg.resampler.embedding_dim))
            )["params"],
        }
        return params

    # ---------------------------------------------------------- first stage
    def encode_first_stage(self, params: dict, video: jax.Array, rng: Optional[jax.Array] = None) -> jax.Array:
        """(B, T, H, W, 3) -> (B, T, h, w, 4) scaled latents.

        reference: ddpm3d.py:622-646 (frame-wise 2D encode, posterior sample,
        x scale_factor).
        """
        b, t, hh, ww, c = video.shape
        frames = video.reshape(b * t, hh, ww, c)
        if self.config.perframe_ae:
            # reference ddpm3d.py:633-641: frame-at-a-time VAE to bound peak
            # memory (the 512+ recipes enable it). TPU-native form: a
            # sequential lax.map inside the same jit — XLA allocates one
            # frame's activations instead of B*T of them; numerics identical.
            moments = jax.lax.map(
                lambda fr: self.vae.apply(
                    {"params": params["vae"]}, fr[None], method=self.vae.encode
                )[0],
                frames,
            )
        else:
            moments = self.vae.apply({"params": params["vae"]}, frames, method=self.vae.encode)
        z = D.mode(moments) if rng is None else D.sample(moments, rng)
        z = z * self.config.scale_factor
        return z.reshape(b, t, *z.shape[1:]).astype(jnp.float32)

    def decode_first_stage(self, params: dict, z: jax.Array) -> jax.Array:
        b, t = z.shape[:2]
        zf = z.reshape(b * t, *z.shape[2:]) / self.config.scale_factor
        if self.config.perframe_ae:
            # reference ddpm3d.py:657-663 (see encode_first_stage)
            x = jax.lax.map(
                lambda fr: self.vae.apply(
                    {"params": params["vae"]}, fr[None], method=self.vae.decode
                )[0],
                zf,
            )
        else:
            x = self.vae.apply({"params": params["vae"]}, zf, method=self.vae.decode)
        return x.reshape(b, t, *x.shape[1:]).astype(jnp.float32)

    # --------------------------------------------------------- conditioning
    def encode_text(self, params: dict, tokens: jax.Array) -> jax.Array:
        return self.clip_text.apply({"params": params["clip_text"]}, tokens).astype(jnp.float32)

    def embed_images(self, params: dict, frames: jax.Array) -> jax.Array:
        """(N, H, W, 3) [-1,1] frames -> (N, num_queries*video_length, 1024) tokens."""
        pre = clip_preprocess(frames)
        tok = self.clip_vision.apply({"params": params["clip_vision"]}, pre)
        return self.image_proj.apply({"params": params["image_proj"]}, tok).astype(jnp.float32)

    def null_text_embedding(self, params: dict, batch_size: int) -> jax.Array:
        ct = self.config.clip_text
        tokens = jnp.asarray(
            empty_prompt_tokens(ct.vocab_size, ct.context_length), jnp.int32
        )[None].repeat(batch_size, axis=0)
        return self.encode_text(params, tokens)

    def encode_text_with_null(self, params: dict, tokens: jax.Array):
        """One text-tower call for [captions ‖ empty prompt] -> (cond (B,L,C),
        null (1,L,C)). Sequences are independent in the tower, so this is
        numerically identical to two calls at ~half the dispatch cost (the
        77-token tower is latency-bound: 5.5 ms/call measured round 4)."""
        ct = self.config.clip_text
        null_tokens = jnp.asarray(
            empty_prompt_tokens(ct.vocab_size, ct.context_length), jnp.int32
        )[None]
        out = self.encode_text(params, jnp.concatenate([tokens, null_tokens], axis=0))
        return out[:-1], out[-1:]

    def cfg_dropout_masks(self, rng: Optional[jax.Array], batch_size: int):
        """(prompt_mask (B,1,1) bool, input_mask (B,1,1,1) float).

        reference: model/base.py:263-273 — one uniform draw drives both.
        """
        p = self.config.uncond_prob
        if rng is None:
            rn = jnp.ones((batch_size,))
        else:
            rn = jax.random.uniform(rng, (batch_size,))
        prompt_mask = (rn < 2 * p)[:, None, None]
        input_drop = ((rn >= p) & (rn < 3 * p)).astype(jnp.float32)
        input_mask = 1.0 - input_drop[:, None, None, None]
        return prompt_mask, input_mask

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
        need_full_z: bool = True,
        prefetch_uncond: bool = False,
        inference: bool = False,
    ) -> tuple[jax.Array, dict]:
        """Assemble (z, cond). reference: model/base.py:237-344.

        inference=True marks the generation context: subclasses may take
        numerically-identical fast paths that are only valid (or only
        profitable) outside training (e.g. CamContextI2V's in-kernel adaptor
        mask, whose Pallas VJP is never exercised at inference).

        prefetch_uncond=True batches build_uncond's zero-image/empty-prompt
        towers into this call's CLIP dispatches (numerically identical; each
        tower is per-item). The result rides in cond["_uncond"]; sample()
        strips it after build_uncond consumes it.

        need_full_z=False (generation fast path, unavailable in interp_mode):
        the VAE encoder is frame-wise, so when nothing downstream consumes the
        full clean latents (`origin_z0` feeds only the static paste/overlap
        surgery in the samplers) the conditioning frame is selected at PIXEL
        level and encoded alone — numerically identical latents at 1/T of the
        encode cost. cond["origin_z0"] is None in this mode and the returned z
        is a broadcast placeholder carrying only the latent shape.
        """
        cfg = self.config
        video = batch["video"]
        b, t = video.shape[:2]
        keys = (
            jax.random.split(rng, 4) if rng is not None else [None] * 4
        )
        if cfg.interp_mode:
            need_full_z = True  # first/last-frame concat needs every latent

        if cond_frame_index is None:
            rcf = cfg.rand_cond_frame if rand_cond_frame is None else rand_cond_frame
            if rcf and keys[2] is not None:
                cond_frame_index = jax.random.randint(keys[2], (b,), 0, cfg.video_length)
            else:
                cond_frame_index = jnp.zeros((b,), jnp.int32)

        take_frame = lambda arr, idx: jnp.take_along_axis(
            arr, idx.reshape(b, 1, 1, 1, 1), axis=1
        ).squeeze(1)

        if need_full_z:
            z = self.encode_first_stage(params, video, keys[0])
        else:
            raw_img = take_frame(video, cond_frame_index)  # (B, H, W, 3)
            z_cond = self.encode_first_stage(params, raw_img[:, None], keys[0])[:, 0]
            z = jnp.repeat(z_cond[:, None], t, axis=1)  # shape placeholder

        cond_emb, null_prompt = self.encode_text_with_null(params, batch["caption_tokens"])
        prompt_mask, input_mask = self.cfg_dropout_masks(keys[1] if random_uncond else None, b)
        prompt_emb = jnp.where(prompt_mask, null_prompt, jax.lax.stop_gradient(cond_emb))

        img = take_frame(video, cond_frame_index)  # (B, H, W, 3)
        img = input_mask * img
        if prefetch_uncond:
            # fold build_uncond's zero-image tower into this call (the ViT is
            # per-image; one extra row replaces a whole second dispatch)
            emb_all = self.embed_images(
                params, jnp.concatenate([img, jnp.zeros_like(img[:1])], axis=0)
            )
            img_emb, uc_img = emb_all[:b], emb_all[b:]
        else:
            img_emb = self.embed_images(params, img)  # (B, 256, 1024)

        cond: dict[str, Any] = {}
        if prefetch_uncond:
            cond["_uncond"] = {
                "img_emb": jnp.repeat(uc_img, b, axis=0),
                "prompt_emb": jnp.repeat(null_prompt, b, axis=0),
            }
        if cfg.interp_mode:
            first_last = (jnp.arange(t) == 0) | (jnp.arange(t) == t - 1)
            img_cat_cond = jnp.where(first_last[None, :, None, None, None], z, 0.0)
        else:
            z_cond = take_frame(z, cond_frame_index) if need_full_z else z_cond
            img_cat_cond = jnp.repeat(z_cond[:, None], t, axis=1)

        cond["c_concat"] = img_cat_cond
        cond["c_cond_frame_index"] = cond_frame_index
        cond["origin_z0"] = z if need_full_z else None
        cond["c_crossattn"] = jnp.concatenate([prompt_emb, img_emb], axis=1)

        if enable_camera_condition:
            cam = self.camera_condition(params, batch, cond_frame_index, trace_scale_factor)
            if cam is not None:
                cond["camera"] = cam
        return z, cond

    def camera_condition(self, params, batch, cond_frame_index, trace_scale_factor):
        """Hook for camera models (reference: model/base.py:475-476). Base: none."""
        return None

    def example_camera_payload(self, image_hw: tuple[int, int]) -> Optional[dict]:
        """Dummy camera payload used at init so camera params materialise."""
        return None

    def get_fs(self, batch: dict) -> jax.Array:
        key = "frame_stride" if self.config.fps_condition_type == "fs" else "fps"
        return batch[key].astype(jnp.int32)

    # -------------------------------------------------------------- denoise
    def apply_model(
        self,
        params: dict,
        x_noisy: jax.Array,
        t: jax.Array,
        cond: dict,
        fs: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Hybrid conditioning dispatch. reference: ddpm3d.py:1251-1320.

        `deterministic=False` (training only — p_losses) enables the UNet's
        dropout (reference trains with dropout 0.1, camcontexti2v_256.yaml:56)
        and the per-block flax remat. Through round 5 this flag was never
        threaded, so training silently ran the eval-mode UNet: no dropout and
        no flax-level remat — the step fit HBM only because XLA's automatic
        HLO rematerialisation kicked in (the `.remat2` fusion labels in the
        r5 profiles are XLA's, not flax's), and the CAMC2V_REMAT_POLICY
        ladder compiled byte-identical programs (its ±15 ms spread is a
        measured tunnel-noise bound, kept in PERF.md as exactly that)."""
        xc = jnp.concatenate([x_noisy, cond["c_concat"]], axis=-1)
        rngs = None
        if not deterministic:
            assert dropout_rng is not None, "training UNet eval needs a dropout rng"
            rngs = {"dropout": dropout_rng}
        return self.unet.apply(
            {"params": params["unet"]},
            xc,
            t,
            cond["c_crossattn"],
            fs,
            cond.get("camera"),
            context_mask=cond.get("c_crossattn_mask"),
            deterministic=deterministic,
            rngs=rngs,
        )

    # ----------------------------------------------------------------- loss
    def get_loss(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        """Per-element loss (no reduction). reference: model/camcontexti2v.py:795-815."""
        lt = self.config.loss_type
        if lt == "l1":
            return jnp.abs(target - pred)
        if lt == "l2":
            return (target - pred) ** 2
        if lt == "l2_log":
            t = pred.shape[1]
            w = jnp.log10(jnp.arange(2, t + 2, dtype=jnp.float32))
            w = w / jnp.sum(w)
            return w[None, :, None, None, None] * (target - pred) ** 2
        raise NotImplementedError(f"loss type '{lt}'")

    def p_losses(
        self, params: dict, z: jax.Array, cond: dict, t: jax.Array, rng: jax.Array, fs=None
    ) -> tuple[jax.Array, dict]:
        """reference: ddpm3d.py:741-785 + camcontexti2v.py:785-815."""
        cfg = self.config
        nkey, okey, dkey = jax.random.split(rng, 3)
        noise = jax.random.normal(nkey, z.shape, z.dtype)
        if cfg.noise_strength > 0:
            b, tt = z.shape[:2]
            offset = jax.random.normal(okey, (b, tt, 1, 1, z.shape[-1]), z.dtype)
            noise = noise + cfg.noise_strength * offset
        if cfg.use_dynamic_rescale:
            z = z * extract(self.scale_arr, t, z.ndim)
        x_noisy = q_sample(self.schedule, z, t, noise)
        model_output = self.apply_model(
            params, x_noisy, t, cond, fs, deterministic=False, dropout_rng=dkey
        )

        if cfg.parameterization == "x0":
            target = z
        elif cfg.parameterization == "eps":
            target = noise
        elif cfg.parameterization == "v":
            from camc2v_tpu.core.schedules import get_v

            target = get_v(self.schedule, z, noise, t)
        else:
            raise NotImplementedError(cfg.parameterization)

        loss_simple = self.get_loss(model_output, target).mean(axis=(1, 2, 3, 4))
        loss = loss_simple.mean()
        return loss, {"loss_simple": loss_simple.mean(), "loss": loss}

    def debug_probe(self, params: dict, batch: dict, rng: jax.Array, t_value=None) -> dict:
        """One denoiser eval with per-layer intermediate capture (debug mode).

        The JAX-native equivalent of the reference ModelWatcherCallback's
        fwd-hook activation capture (reference: main/callbacks.py:436-737,
        log_intermediate_values_fwd): flax `capture_intermediates` records
        every submodule's __call__ output on a single probe step; the caller
        (ModelWatcher / tools) summarises them with
        `main.callbacks.intermediates_report` to name the first layer that
        produced a NaN/Inf and dump the full per-layer stats to disk.

        Returns {"output": eps-hat, "intermediates": nested capture tree}.
        """
        bkey, tkey, nkey = jax.random.split(rng, 3)
        z, cond = self.prepare_batch(params, batch, bkey, random_uncond=False)
        fs = self.get_fs(batch)
        b = z.shape[0]
        tv = self.config.timesteps // 2 if t_value is None else t_value
        t = jnp.full((b,), tv, jnp.int32)
        noise = jax.random.normal(nkey, z.shape, z.dtype)
        x_noisy = q_sample(self.schedule, z, t, noise)
        xc = jnp.concatenate([x_noisy, cond["c_concat"]], axis=-1)
        out, state = self.unet.apply(
            {"params": params["unet"]},
            xc,
            t,
            cond["c_crossattn"],
            fs,
            cond.get("camera"),
            context_mask=cond.get("c_crossattn_mask"),
            capture_intermediates=True,
            mutable=["intermediates"],
        )
        return {"output": out, "intermediates": state["intermediates"]}

    def training_loss(
        self, params: dict, batch: dict, rng: jax.Array, **prepare_kwargs
    ) -> tuple[jax.Array, dict]:
        """Full train-step loss. reference: shared_step, camcontexti2v.py:779-793.

        `prepare_kwargs` carries static per-phase flags (e.g. CamContextI2V's
        `adaptor_use_mask` freeze schedule — reference camcontexti2v.py:771-776);
        flipping one triggers a single retrace.
        """
        bkey, tkey, lkey = jax.random.split(rng, 3)
        z, cond = self.prepare_batch(params, batch, bkey, random_uncond=True, **prepare_kwargs)
        fs = self.get_fs(batch)
        b = z.shape[0]
        t = jax.random.randint(tkey, (b,), 0, self.config.timesteps)
        return self.p_losses(params, z, cond, t, lkey, fs)

    # --------------------------------------------------------------- sample
    def build_uncond(
        self,
        params: dict,
        cond: dict,
        batch_size: int,
        image_hw: tuple[int, int],
        negative_prompt_tokens: Optional[jax.Array] = None,
    ) -> dict:
        """Unconditional embedding assembly. reference: model/base.py:418-447
        (uncond_type 'empty_seq' / 'zero_embed' / 'negative_prompt').

        When prepare_batch ran with prefetch_uncond=True, the zero-image and
        empty-prompt embeddings arrive pre-batched in cond["_uncond"] (one
        CLIP dispatch instead of two extra)."""
        ut = self.config.uncond_type
        pre = cond.get("_uncond")
        if negative_prompt_tokens is not None or ut == "negative_prompt":
            assert negative_prompt_tokens is not None, "negative_prompt mode needs tokens"
            uc_prompt = self.encode_text(params, negative_prompt_tokens)
        elif ut == "zero_embed":
            uc_prompt = jnp.zeros_like(
                cond["c_crossattn"][:, : self.config.clip_text.context_length]
            )
        elif pre is not None:  # empty_seq, prefetched
            uc_prompt = pre["prompt_emb"]
        else:  # empty_seq
            uc_prompt = self.null_text_embedding(params, batch_size)
        if pre is not None:
            uc_img = pre["img_emb"]
        else:
            zero_img = jnp.zeros((batch_size, *image_hw, 3))
            uc_img = self.embed_images(params, zero_img)
        uc = {k: v for k, v in cond.items() if k != "_uncond"}
        uc["c_crossattn"] = jnp.concatenate([uc_prompt, uc_img], axis=1)
        uc.pop("c_crossattn_mask", None)  # the uncond context is single-frame
        return uc

    def sample(
        self,
        params: dict,
        batch: dict,
        rng: jax.Array,
        *,
        ddim_steps: int = 25,
        ddim_eta: float = 1.0,
        sampler: str = "ddim",
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        cfg_interval: Optional[tuple[float, float]] = None,
        timestep_spacing: str = "uniform",
        camera_cfg: float = 1.0,
        camera_cfg_scheduler: str = "constant",
        enable_camera_condition: bool = True,
        cond_frame_index: Optional[jax.Array] = None,
        trace_scale_factor: float = 1.0,
        paste_cond_frame: bool = False,
        num_overlap: int = 0,
        blend_mask: Optional[jax.Array] = None,
        blend_x0: Optional[jax.Array] = None,
        clean_cond: bool = False,
        negative_prompt_tokens: Optional[jax.Array] = None,
        decode: bool = True,
        return_cond: bool = False,
    ):
        """Full DDIM CFG sampling -> decoded video (B, T, H, W, 3).

        reference: log_images -> sample_log -> DDIMSampler.sample
        (model/base.py:346-472, ddpm3d.py:992-1002, samplers/ddim.py:59-238).
        """
        cfg = self.config
        pkey, skey = jax.random.split(rng)
        z, cond = self.prepare_batch(
            params,
            batch,
            None,
            random_uncond=False,
            rand_cond_frame=False,
            cond_frame_index=cond_frame_index,
            enable_camera_condition=enable_camera_condition,
            trace_scale_factor=trace_scale_factor,
            # full clean latents are consumed only by the paste/overlap
            # surgery; otherwise encode just the conditioning frame(s)
            need_full_z=paste_cond_frame or num_overlap > 0,
            # fold the uncond CLIP towers into the cond dispatches
            prefetch_uncond=guidance_scale != 1.0,
            inference=True,
        )
        b = z.shape[0]
        fs = self.get_fs(batch)
        image_hw = batch["video"].shape[2:4]

        # Sampling reuses ONE camera geometry for the whole denoise scan, so
        # the epipolar masks can be materialised once as bf16 penalty tiles
        # and streamed by the kernel for all 25 steps instead of recomputed
        # from epipolar lines each step (training keeps the in-kernel path —
        # its geometry changes every step).
        epi_cfg = getattr(self.config, "epipolar", None)
        cam = cond.get("camera")
        if cam is not None and epi_cfg is not None and cam.get("epi_prep"):
            from camc2v_tpu.nn.epipolar import add_precomputed_penalties

            cam["epi_prep"] = add_precomputed_penalties(
                cam["epi_prep"], epi_cfg, cfg.video_length
            )

        ddim = DDIMSchedule.create(
            self.schedule, ddim_steps, timestep_spacing, ddim_eta,
            scale_arr=self.scale_arr,
        )
        x_T = jax.random.normal(pkey, z.shape, jnp.float32)

        uc = (
            self.build_uncond(params, cond, b, image_hw, negative_prompt_tokens)
            if guidance_scale != 1.0
            else None
        )
        cond.pop("_uncond", None)  # consumed by build_uncond; not model input
        model_out_fn = self.build_guided_fn(
            params, cond, uc, fs,
            guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale,
            camera_cfg=camera_cfg,
            camera_cfg_scheduler=camera_cfg_scheduler,
            cfg_interval=cfg_interval,
        )

        options = SamplerOptions(
            parameterization=cfg.parameterization,
            paste_cond_frame=paste_cond_frame,
            num_overlap=num_overlap,
            clean_cond=clean_cond,
        )
        extra = {}
        if blend_mask is not None:
            # reference `mask`/`x0` args (samplers/ddim.py:133-180): per-pixel
            # inpainting blend re-imposed every step (dpmpp lacks the blend —
            # it is a DDIM-loop reference feature)
            extra = {"blend_mask": blend_mask, "blend_x0": blend_x0}
        if sampler == "ddpm":
            # ancestral p_sample_loop over the FULL DDPM table — parity with
            # the reference's sample_log(..., ddim=False) -> LatentDiffusion
            # .sample -> p_sample_loop (ddpm3d.py:974-986). ddim_steps / eta /
            # spacing are DDIM-only knobs and are ignored; paste/overlap latent
            # surgery and dynamic rescale are DDIM-sampler features the
            # reference ancestral loop does not implement.
            if paste_cond_frame or num_overlap > 0:
                raise ValueError("paste/overlap surgery requires sampler='ddim'")
            samples = p_sample_loop(
                skey, self.schedule, x_T, model_out_fn,
                options=options, **extra,
            )
            out = self.decode_first_stage(params, samples) if decode else samples
            if return_cond:
                return out, cond
            return out
        if sampler == "ddim":
            sample_fn = ddim_sample
        elif sampler in ("dpmpp_2m", "dpmpp"):
            sample_fn = dpmpp_2m_sample  # deterministic; ddim_eta is ignored
            if extra:
                raise ValueError("blend_mask/blend_x0 requires sampler='ddim'")
        else:
            raise ValueError(f"unknown sampler {sampler!r} (ddim | dpmpp_2m | ddpm)")
        samples = sample_fn(
            skey,
            ddim,
            x_T,
            model_out_fn,
            options=options,
            schedule=self.schedule,
            origin_z0=cond["origin_z0"],
            cond_frame_index=cond["c_cond_frame_index"],
            **extra,
        )
        out = self.decode_first_stage(params, samples) if decode else samples
        if return_cond:
            return out, cond
        return out

    def _pad_uncond_for_fusion(self, cond: dict, uc: dict):
        """Make a shorter DC-layout uncond context stackable with a longer
        (CamContext semantic-branch) cond context, EXACTLY, via masks.

        The uncond context (text + one frame-set of image tokens) is routed
        per-frame by the UNet (nn/unet3d.py l_ctx == text+T*ipf branch); the
        cond context is broadcast to every frame. To fuse both into one
        batch-2B launch, pad the uncond tokens to cond's length and express
        the per-frame routing as a (B, T, L) validity mask: frame i sees text
        + its own ipf image tokens; padding is invalid everywhere. Masked
        softmax over the valid set == per-frame-slice attention (exact).
        Returns (cond, uc) with aligned shapes + masks, or None when the
        uncond layout isn't the padable DC form.
        """
        ucfg = self.config.unet
        lt = ucfg.text_context_len
        ipf = ucfg.img_tokens_per_frame
        t = self.config.video_length
        cc, cu = cond["c_crossattn"], uc["c_crossattn"]
        b, lc = cc.shape[:2]
        lu = cu.shape[1]
        if lu >= lc or lu != lt + t * ipf:
            return None
        uc = dict(uc)
        uc["c_crossattn"] = jnp.concatenate(
            [cu, jnp.zeros((b, lc - lu, cu.shape[-1]), cu.dtype)], axis=1
        )
        img_len = lc - lt
        tok = jnp.arange(img_len)
        frame = jnp.arange(t)
        per_frame = (tok[None, :] >= frame[:, None] * ipf) & (
            tok[None, :] < (frame[:, None] + 1) * ipf
        )  # (T, img_len); padding columns are False everywhere
        uc_mask = jnp.concatenate([jnp.ones((t, lt), bool), per_frame], axis=1)
        uc["c_crossattn_mask"] = jnp.broadcast_to(uc_mask[None], (b, t, lc))
        cond = dict(cond)
        cmask = cond.get("c_crossattn_mask")
        if cmask is None:
            cmask3 = jnp.ones((b, t, lc), bool)
        else:
            cmask3 = jnp.broadcast_to(cmask.astype(bool)[:, None, :], (b, t, lc))
        cond["c_crossattn_mask"] = cmask3
        return cond, uc

    def build_guided_fn(
        self,
        params: dict,
        cond: dict,
        uc: Optional[dict],
        fs: Optional[jax.Array],
        *,
        guidance_scale: float = 1.0,
        guidance_rescale: float = 0.0,
        camera_cfg: float = 1.0,
        camera_cfg_scheduler: str = "constant",
        cfg_interval: Optional[tuple[float, float]] = None,
    ):
        """Build the guided denoiser closure for the sampler.

        CFG semantics follow reference samplers/ddim.py:253-283: two (or three,
        with camera CFG) UNet evaluations per step. When cond/uncond context
        shapes match, the cond+uncond pair runs as ONE batch-2B UNet launch
        (better MXU utilisation than two sequential launches — the uncond pass
        shares c_concat and camera payload, so stacking is exact).

        `cfg_interval=(lo, hi)` (t-space, 0..999) restricts guidance to steps
        whose timestep falls inside [lo, hi]; outside, the step runs the
        conditional eval only (no uncond/camera-uncond passes — a `lax.cond`
        picks the program per step inside the scan). Guidance-truncation
        serving knob (Kynkäänniemi et al. 2024); NOT a reference feature —
        default None reproduces reference CFG exactly.
        """
        import math as _math

        from camc2v_tpu.core.schedules import rescale_noise_cfg

        b = cond["c_concat"].shape[0]
        cond_entry = cond  # pre-fusion cond (full epi penalties) for the
        # uncond-free branch of cfg_interval
        if uc is None or guidance_scale == 1.0:
            return lambda x, t: self.apply_model(params, x, t, cond, fs)

        if (
            uc["c_crossattn"].shape != cond["c_crossattn"].shape
            and os.environ.get("CAMC2V_FUSED_CFG", "0") == "1"
        ):
            padded = self._pad_uncond_for_fusion(cond, uc)
            if padded is not None:
                cond, uc = padded

        fuse = uc["c_crossattn"].shape == cond["c_crossattn"].shape
        if fuse:
            # uc shares cond's camera geometry (`build_uncond` copies it), so
            # the precomputed epipolar penalties need not be duplicated into
            # the fused batch: the kernel indexes a (b, Lq, Lk) array modulo b
            # (ops/epipolar_flash.py pen_spec). Pop them out BEFORE the
            # tree_map — the CLI sample path runs eagerly, where the concat
            # would transiently materialise a ~1 GB ds8 array — and reattach
            # the single copy after.
            shared_pen = {}
            cam = cond.get("camera")
            if isinstance(cam, dict) and cam.get("epi_prep"):
                strip = {
                    ds: {k: v for k, v in entry.items() if k != "penalties"}
                    for ds, entry in cam["epi_prep"].items()
                }
                shared_pen = {
                    ds: entry["penalties"]
                    for ds, entry in cam["epi_prep"].items()
                    if "penalties" in entry
                }
                cond = dict(cond, camera=dict(cam, epi_prep=strip))
                ucam = uc["camera"]
                uc = dict(uc, camera=dict(ucam, epi_prep={
                    ds: {k: v for k, v in entry.items() if k != "penalties"}
                    for ds, entry in ucam["epi_prep"].items()
                }))
            stacked = jax.tree_util.tree_map(
                lambda a, c: jnp.concatenate([a, c], axis=0), cond, uc
            )
            for ds, pen in shared_pen.items():
                stacked["camera"]["epi_prep"][ds]["penalties"] = pen
            fs2 = None if fs is None else jnp.concatenate([fs, fs])

            def eps_pair(x, t):
                out = self.apply_model(
                    params,
                    jnp.concatenate([x, x]),
                    jnp.concatenate([t, t]),
                    stacked,
                    fs2,
                )
                return out[:b], out[b:]

        else:

            def eps_pair(x, t):
                return (
                    self.apply_model(params, x, t, cond, fs),
                    self.apply_model(params, x, t, uc, fs),
                )

        do_camera_cfg = camera_cfg != 1.0 and cond.get("camera") is not None
        cond_nc = {k: v for k, v in cond.items() if k != "camera"} if do_camera_cfg else None

        def model_out_fn(x, t):
            e_c, e_u = eps_pair(x, t)
            combined = e_u + guidance_scale * (e_c - e_u)
            if do_camera_cfg:
                e_nc = self.apply_model(params, x, t, cond_nc, fs)
                if camera_cfg_scheduler == "constant":
                    w = 1.0
                elif camera_cfg_scheduler == "cosine":
                    w = jnp.cos((1.0 - t[0] / 999.0) * _math.pi / 2)
                else:
                    raise NotImplementedError(camera_cfg_scheduler)
                combined = combined + (camera_cfg - 1.0) * w * (e_c - e_nc)
            if guidance_rescale > 0.0:
                combined = rescale_noise_cfg(combined, e_c, guidance_rescale)
            return combined

        if cfg_interval is None:
            return model_out_fn

        lo, hi = cfg_interval

        def cond_only_fn(x, t):
            return self.apply_model(params, x, t, cond_entry, fs)

        def gated_fn(x, t):
            inside = jnp.logical_and(t[0] >= lo, t[0] <= hi)
            return jax.lax.cond(inside, model_out_fn, cond_only_fn, x, t)

        return gated_fn
