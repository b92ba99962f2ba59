"""Image2Video interactive engine: single image + pose trajectory -> video.

reference: CamContextI2V/main/runtime.py:59-394 — the demo/serving engine:
lazy multi-model cache, pose-trajectory pipeline (txt w2c -> c2w, trace-scale
extraction, Bézier speed remap, loop mode, lerp to video_length,
auto-regressive pose extension), auto-regressive chunked video generation
(last generated frame becomes the next chunk's conditioning frame), and mp4
export. The reference's CPU-offload model cache becomes simple params
residency here (JAX arrays stay on device; switching models swaps pytrees).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import numpy as np

logger = logging.getLogger("camc2v")


def load_trajectory_txt(path: str) -> np.ndarray:
    """Pose txt (reference camera_poses/*.txt format: per-line 3x4 or RealEstate
    rows) -> (F, 4, 4) w2c."""
    arr = np.loadtxt(path)
    if arr.ndim == 1:
        arr = arr[None]
    if arr.shape[1] == 19:  # RealEstate rows: ts + intrinsics + 3x4
        rt34 = arr[:, 7:].reshape(-1, 3, 4)
    elif arr.shape[1] == 12:
        rt34 = arr.reshape(-1, 3, 4)
    else:
        raise ValueError(f"unrecognised trajectory format: {arr.shape}")
    bottom = np.tile(np.array([[[0.0, 0.0, 0.0, 1.0]]]), (len(rt34), 1, 1))
    return np.concatenate([rt34, bottom], axis=1)


class Image2Video:
    """Lazy multi-model generation engine."""

    def __init__(
        self,
        model_configs: dict[str, str],
        *,
        result_dir: str = "results/demo",
        video_length: int = 16,
        resolution: tuple[int, int] = (256, 256),
        tokenizer=None,
        dtype=None,
        seed: int = 123,
    ):
        """model_configs: {model_name: yaml_path}."""
        from camc2v_tpu.utils.tpubench import enable_compile_cache

        enable_compile_cache()
        self.model_configs = model_configs
        self.result_dir = result_dir
        self.video_length = video_length
        self.resolution = resolution
        self.seed = seed
        self.dtype = dtype
        self._models: dict[str, tuple[Any, Any]] = {}
        # None -> resolved lazily from the first built model's text-tower config
        # (context length / vocab must match the model, as in the reference,
        # where the cond stage owns tokenization: lvdm FrozenOpenCLIPEmbedder)
        self.tokenizer = tokenizer
        os.makedirs(result_dir, exist_ok=True)

    def _get_tokenizer(self, model):
        if self.tokenizer is None:
            from camc2v_tpu.data.tokenizer import HashTokenizer, default_tokenizer

            tcfg = model.config.clip_text
            tok = default_tokenizer(context_length=tcfg.context_length)
            if isinstance(tok, HashTokenizer) and tcfg.vocab_size != tok.vocab_size:
                tok = HashTokenizer(tcfg.vocab_size, tcfg.context_length)
            self.tokenizer = tok
        return self.tokenizer

    def _get_model(self, name: str):
        """Lazy build + checkpoint load (reference: runtime.py:85-137, 203-219)."""
        if name in self._models:
            return self._models[name]
        import jax

        from camc2v_tpu.config_yaml import build_model_from_config, load_yaml

        cfg = load_yaml(self.model_configs[name])
        model, pretrained = build_model_from_config(cfg, dtype=self.dtype)
        params = model.init_params(jax.random.key(self.seed), self.resolution)
        if pretrained and os.path.exists(pretrained):
            from camc2v_tpu.utils.torch_import import import_state_dict, load_torch_checkpoint

            sd = load_torch_checkpoint(pretrained)
            params, report = import_state_dict(sd, params, model.config.unet)
            logger.info(f"[{name}] imported {len(report['mapped'])} tensors")
        self._models[name] = (model, params)
        return self._models[name]

    def prepare_trajectory(
        self,
        w2c: np.ndarray,
        *,
        trace_extract_ratio: float = 1.0,
        bezier_coef_a: Optional[float] = None,
        bezier_coef_b: Optional[float] = None,
        loop: bool = False,
        num_chunks: int = 1,
    ) -> np.ndarray:
        """Trajectory pipeline -> (num_chunks*video_length, 4, 4) c2w.

        reference: runtime.py:168-201.
        """
        from camc2v_tpu.camera.trajectory import (
            camera_pose_lerp,
            camera_pose_lerp_bezier,
            extend_trajectory_autoregressive,
        )

        c2w = np.linalg.inv(w2c)
        if trace_extract_ratio < 1.0:
            c2w = c2w[: max(2, int(len(c2w) * trace_extract_ratio))]
        if loop:
            c2w = np.concatenate([c2w, c2w[::-1]], axis=0)
        if num_chunks > 1:
            c2w = extend_trajectory_autoregressive(c2w, num_chunks)
        total = self.video_length * num_chunks
        if bezier_coef_a is not None or bezier_coef_b is not None:
            return camera_pose_lerp_bezier(c2w, total, bezier_coef_a, bezier_coef_b)
        return camera_pose_lerp(c2w, total)

    def get_image(
        self,
        model_name: str,
        image: np.ndarray,
        prompt: str,
        *,
        trajectory: Optional[np.ndarray] = None,
        intrinsics: Optional[np.ndarray] = None,
        context_frames: Optional[np.ndarray] = None,
        context_w2c: Optional[np.ndarray] = None,
        num_chunks: int = 1,
        frame_stride: int = 8,
        ddim_steps: int = 25,
        sampler: str = "ddim",
        guidance_scale: float = 7.5,
        cfg_interval: Optional[tuple] = None,
        camera_cfg: float = 1.0,
        trace_scale_factor: float = 1.0,
        save_name: Optional[str] = None,
        **traj_kwargs,
    ) -> str:
        """Generate (auto-regressively for num_chunks>1) and save an mp4.

        reference: runtime.py:139-346.
        """
        import jax.numpy as jnp
        import jax

        from camc2v_tpu.data.realestate10k import resize_center_crop
        from camc2v_tpu.utils.save_video import to_uint8
        from camc2v_tpu.data.video_io import write_video

        model, params = self._get_model(model_name)
        H, W = self.resolution
        T = self.video_length

        if image.dtype != np.uint8:
            image = np.clip((image.astype(np.float32) + 1) / 2 * 255, 0, 255).astype(np.uint8)
        if intrinsics is None:
            intr_norm = np.tile(np.array([[0.5 * max(H, W) / W, 0.5 * max(H, W) / H, 0.5, 0.5]]), (T, 1))
        else:
            intr_norm = intrinsics
        frames_resized, K = resize_center_crop(image[None], H, W, intr_norm[:1])
        img = (frames_resized[0].astype(np.float32) / 255 - 0.5) * 2
        K = np.tile(K, (T, 1, 1))

        if trajectory is None:
            c2w_all = np.tile(np.eye(4), (T * num_chunks, 1, 1))
        else:
            c2w_all = self.prepare_trajectory(trajectory, num_chunks=num_chunks, **traj_kwargs)

        clips = []
        cond_image = img
        for chunk in range(num_chunks):
            c2w = c2w_all[chunk * T : (chunk + 1) * T]
            video = np.tile(cond_image[None], (T, 1, 1, 1))
            batch = {
                "video": jnp.asarray(video)[None],
                "caption_tokens": jnp.asarray(self._get_tokenizer(model)(prompt), jnp.int32),
                "frame_stride": jnp.full((1,), frame_stride, jnp.int32),
                "camera_intrinsics": jnp.asarray(K, jnp.float32)[None],
                "RT": jnp.asarray(np.linalg.inv(c2w), jnp.float32)[None],
            }
            if context_frames is not None:
                batch["cond_frames"] = jnp.asarray(context_frames, jnp.float32)[None]
                batch["RT_cond"] = jnp.asarray(
                    context_w2c if context_w2c is not None else np.tile(np.eye(4), (len(context_frames), 1, 1)),
                    jnp.float32,
                )[None]
            out = model.sample(
                params,
                batch,
                jax.random.key(self.seed + chunk),
                ddim_steps=ddim_steps,
                sampler=sampler,
                guidance_scale=guidance_scale,
                cfg_interval=cfg_interval,
                camera_cfg=camera_cfg,
                timestep_spacing="uniform_trailing",
                guidance_rescale=0.7,
                trace_scale_factor=trace_scale_factor,
            )
            clip = np.asarray(out[0])
            clips.append(clip if chunk == 0 else clip[1:])
            cond_image = clip[-1]  # last frame conditions the next chunk

        video_out = np.concatenate(clips, axis=0)
        name = save_name or f"{model_name}_{abs(hash(prompt)) % 10**8}"
        path = os.path.join(self.result_dir, f"{name}.mp4")
        write_video(path, to_uint8(video_out), fps=8)
        logger.info(f"[runtime] wrote {path}")
        return path
