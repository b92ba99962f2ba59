"""Training / generation harness: the per-host run loop.

Replaces the reference's torchrun + Lightning Trainer entry
(reference: CamContextI2V/main/trainer.py:47-194, main/utils_train.py):
workspace init + config snapshot, rank-aware logging, model build from YAML,
reference-checkpoint load, pjit data-parallel fit loop with callbacks /
checkpointing / SIGUSR1+SIGTERM emergency save, and the generation ("test")
loop that writes the per-video evaluation directories.
"""

from __future__ import annotations

import logging
import os
import shutil
import signal
import sys
import time
from typing import Any, Optional

import numpy as np

logger = logging.getLogger("camc2v")


def setup_logger(logdir: Optional[str] = None, rank: int = 0) -> logging.Logger:
    """Coloured rank-aware logger (reference: main/utils_train.py:258-335)."""
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter(
        f"\033[36m[%(asctime)s]\033[0m[rank{rank}][%(levelname)s] %(message)s", "%H:%M:%S"
    )
    if rank == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if logdir:
        os.makedirs(f"{logdir}/logs", exist_ok=True)
        suffix = "" if rank == 0 else f".rank{rank}"
        fh = logging.FileHandler(f"{logdir}/logs/log.txt{suffix}")
        fh.setFormatter(logging.Formatter("[%(asctime)s][%(levelname)s] %(message)s"))
        logger.addHandler(fh)
    return logger


def init_workspace(name: str, logdir: str, config: dict) -> dict:
    """Create run directories + snapshot the config (reference: utils_train.py:16-41)."""
    import yaml

    workdir = os.path.join(logdir, name)
    dirs = {
        "workdir": workdir,
        "ckptdir": os.path.join(workdir, "checkpoints"),
        "cfgdir": os.path.join(workdir, "configs"),
        "loginfo": os.path.join(workdir, "logs"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    with open(os.path.join(dirs["cfgdir"], "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)
    return dirs


def batch_to_device(batch: dict, tokenizer=None) -> dict:
    """numpy batch dict -> model input dict (tokenize captions if needed)."""
    import jax.numpy as jnp

    out = {}
    for k, v in batch.items():
        if k == "caption":
            if tokenizer is not None and "caption_tokens" not in batch:
                out["caption_tokens"] = jnp.asarray(tokenizer(v), jnp.int32)
            continue
        if k in ("video_path", "all_frames"):
            continue
        if isinstance(v, (list, tuple)) and v and isinstance(v[0], str):
            continue
        out[k] = jnp.asarray(v)
    return out


class Trainer:
    """Data-parallel fit loop over a host dataloader."""

    def __init__(
        self,
        model,
        train_config,
        dataloader,
        *,
        val_dataloader=None,
        callbacks: Optional[list] = None,
        ckpt_dir: Optional[str] = None,
        ckpt_every_n_steps: int = 5000,
        val_every_n_steps: Optional[int] = None,
        tokenizer=None,
        mesh=None,
        seed: int = 0,
        flag_schedule: Optional[list] = None,
        log_every_n_steps: int = 10,
    ):
        """flag_schedule: [(from_step, {loss_kwargs})] phases — the FreezeCallback
        analogue (reference: main/callbacks.py:740-776 + the epipolar-mask
        unlock, model/camcontexti2v.py:771-776). Each phase rebuilds the jitted
        step once with its static flags."""
        # persistent compiled-program cache: flagship programs re-load in
        # seconds across process restarts (verified through the axon
        # remote-compile tunnel, which otherwise costs ~10 min per variant)
        from camc2v_tpu.utils.tpubench import enable_compile_cache

        enable_compile_cache()
        self.model = model
        self.train_config = train_config
        self.dataloader = dataloader
        self.val_dataloader = val_dataloader
        self.callbacks = callbacks or []
        self.ckpt_dir = ckpt_dir
        self.ckpt_every_n_steps = ckpt_every_n_steps
        self.val_every_n_steps = val_every_n_steps
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.seed = seed
        self.flag_schedule = sorted(flag_schedule or [], key=lambda x: x[0])
        self.log_every_n_steps = max(1, log_every_n_steps)
        self._stop = False
        self._emergency_save = False
        # most recent device batch / state, kept for debug probes (the
        # ModelWatcher probe_fn closes over these to re-run the offending
        # step with capture_intermediates)
        self.last_batch = None
        self.last_state = None

    def _flags_for(self, step: int) -> dict:
        flags: dict = {}
        for from_step, kw in self.flag_schedule:
            if step >= from_step:
                flags = kw
        return flags

    def _install_signal_handlers(self):
        """SIGUSR1/SIGTERM -> checkpoint then continue/stop (reference melk,
        main/trainer.py:159-174)."""

        def melk(signum, frame):
            logger.info(f"signal {signum}: scheduling emergency checkpoint")
            self._emergency_save = True
            if signum == signal.SIGTERM:
                self._stop = True

        for sig in (signal.SIGUSR1, signal.SIGTERM):
            try:
                signal.signal(sig, melk)
            except ValueError:
                pass  # non-main thread

    def fit(self, state, max_steps: Optional[int] = None, resume: bool = True):
        import jax

        from camc2v_tpu.parallel import mesh as M
        from camc2v_tpu.parallel import trainer as TR
        from camc2v_tpu.utils import checkpoint as CK

        max_steps = max_steps or self.train_config.max_steps
        self._install_signal_handlers()

        if resume and self.ckpt_dir and CK.latest_step(self.ckpt_dir) is not None:
            state = CK.restore_checkpoint(self.ckpt_dir, state)
            logger.info(f"resumed from step {int(state.step)}")

        if self.mesh is not None:
            state = TR.shard_train_state(self.mesh, state,
                                         self.train_config.shard_params)
        rng = jax.random.key(self.seed)

        step = int(state.step)
        current_flags = self._flags_for(step)
        step_fn = TR.make_sharded_train_step(
            self.model, self.train_config, self.mesh, loss_kwargs=current_flags,
            state=state if self.mesh is not None else None,
            shard_params=self.train_config.shard_params,
        )
        metrics = {}
        while step < max_steps and not self._stop:
            for batch in self.dataloader:
                if step >= max_steps or self._stop:
                    break
                flags = self._flags_for(step)
                if flags != current_flags:
                    logger.info(f"[phase] step {step}: flags -> {flags} (retracing step fn)")
                    current_flags = flags
                    step_fn = TR.make_sharded_train_step(
                        self.model, self.train_config, self.mesh, loss_kwargs=current_flags,
                        state=state if self.mesh is not None else None,
                        shard_params=self.train_config.shard_params,
                    )
                for cb in self.callbacks:
                    cb.on_train_batch_start(step)
                device_batch = batch_to_device(batch, self.tokenizer)
                if self.mesh is not None:
                    device_batch = M.shard_batch(self.mesh, device_batch)
                for cb in self.callbacks:
                    cb.on_data_loaded(step)
                self.last_batch = device_batch
                state, metrics = step_fn(state, device_batch, rng)
                self.last_state = state
                step += 1
                # pulling metrics to host serialises dispatch — only sync on
                # the logging interval so XLA can pipeline steps in between
                # (the reference also logs on intervals, utils_train.py:111-150)
                if step % self.log_every_n_steps == 0 or step >= max_steps or self._stop:
                    host_metrics = {k: float(v) for k, v in metrics.items()}
                    step = int(state.step)
                else:
                    host_metrics = {}
                for cb in self.callbacks:
                    cb.on_train_batch_end(step, state, host_metrics)
                if self.ckpt_dir and (step % self.ckpt_every_n_steps == 0 or self._emergency_save):
                    # pass the (possibly sharded) state directly: orbax
                    # coordinates the multi-process save itself; EVERY process
                    # calls this (rank gating + device_get of non-addressable
                    # shards would deadlock in multi-host runs)
                    CK.save_checkpoint(self.ckpt_dir, state, step)
                    logger.info(f"checkpoint saved at step {step}")
                    self._emergency_save = False
                if self.val_dataloader is not None and self.val_every_n_steps and step % self.val_every_n_steps == 0:
                    self.validate(state)
        if self.ckpt_dir:
            CK.save_checkpoint(self.ckpt_dir, state, step)
        return state

    def validate(self, state, max_batches: int = 8):
        """Jitted, mesh-sharded validation: the loss mean runs over the GLOBAL
        batch (all hosts), replacing the eager per-host loop.

        Evaluates with EMA params when EMA is enabled (the reference validates
        through its LitEma swap, lvdm/models/ddpm3d.py ema_scope) and rebuilds
        the jitted eval fn whenever the flag schedule enters a new phase."""
        import jax

        from camc2v_tpu.parallel import mesh as M
        from camc2v_tpu.parallel import trainer as TR

        flags = self._flags_for(int(state.step))
        if getattr(self, "_eval_flags", None) != flags or not hasattr(self, "_eval_fn"):
            self._eval_fn = TR.make_sharded_eval_step(self.model, self.mesh, loss_kwargs=flags)
            self._eval_flags = flags
        params = state.params
        ema_tag = ""
        if state.ema_params is not None:
            params = state.ema_params  # plain params pytree (core/ema.py)
            ema_tag = " (EMA)"
        losses = []
        for i, batch in enumerate(self.val_dataloader):
            if i >= max_batches:
                break
            device_batch = batch_to_device(batch, self.tokenizer)
            if self.mesh is not None:
                device_batch = M.shard_batch(self.mesh, device_batch)
            metrics = self._eval_fn(params, device_batch, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        if losses:
            logger.info(f"[val{ema_tag}] loss={np.mean(losses):.4f} over {len(losses)} batches")
        return float(np.mean(losses)) if losses else None


def make_sample_logger(
    model,
    get_params,
    dataloader,
    out_dir: str,
    *,
    tokenizer=None,
    sample_kwargs: Optional[dict] = None,
    num_batches: int = 1,
    sinks=None,
):
    """Build the ImageLogger sample_fn: periodic train-time sample grids.

    reference: main/callbacks.py:163-236 (train/val media logging every N
    optimisation steps). `get_params` is a thunk returning current (or EMA)
    params so the closure tracks training state. Media additionally flows to
    the metric sinks (wandb/tensorboard), reference callbacks.py:183-207.
    """
    import jax

    from camc2v_tpu.utils.save_video import save_grid

    sample_kwargs = dict(sample_kwargs or {})
    os.makedirs(out_dir, exist_ok=True)
    # FIXED logging batches, captured once: successive media logs must show the
    # SAME examples so progress is comparable across steps (drawing from the
    # loader head each call showed whatever the epoch iterator was up to)
    fixed: list = []

    def sample_fn(step: int):
        if not fixed:
            it = iter(dataloader)
            for _ in range(num_batches):
                try:
                    fixed.append(next(it))
                except StopIteration:
                    break
        for i, batch in enumerate(fixed):
            device_batch = batch_to_device(batch, tokenizer)
            videos = model.sample(get_params(), device_batch, jax.random.key(step + i), **sample_kwargs)
            videos = np.asarray(videos)
            save_grid(os.path.join(out_dir, f"step{step:07d}_b{i}.mp4"), videos)
            for sink in sinks or ():
                sink.log_video(step, f"samples/batch{i}", videos[0])
            logger.info(f"[media] logged samples at step {step}")

    return sample_fn


def generate_videos(
    model,
    params,
    dataloader,
    out_dir: str,
    *,
    tokenizer=None,
    sample_kwargs: Optional[dict] = None,
    max_batches: Optional[int] = None,
    skip_existing: bool = True,
    seed: int = 0,
    mesh=None,
) -> list[str]:
    """The generation ("test") pass: per-video evaluation directories.

    reference: 02_generate_videos.py + ImageLogger test mode
    (main/callbacks.py:238-262) + log_evaluation (utils/save_video.py:65-156).
    `skip_existing` reproduces the reference's --continue resume semantics
    (02_generate_videos.py:523-535).

    With `mesh`, batches whose global size divides the mesh run as ONE
    data-parallel SPMD program over all chips (parallel/sampling.py) — the
    TPU-native form of the reference's one-process-per-GPU generation;
    remainder batches fall back to the single-device path.
    """
    import jax

    from camc2v_tpu.utils.tpubench import enable_compile_cache

    enable_compile_cache()

    from camc2v_tpu.utils.save_video import log_evaluation

    sample_kwargs = dict(sample_kwargs or {})
    sharded_sampler = None
    if mesh is not None:
        if jax.process_count() > 1:
            # per-host mp4 writes below need the full batch addressable; use
            # per-process meshes (rank-strided data, reference style) instead
            raise ValueError("sharded generation expects a single-process mesh")
        from camc2v_tpu.parallel.sampling import make_sharded_sampler

        sharded_sampler = make_sharded_sampler(model, mesh, sample_kwargs)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i, batch in enumerate(dataloader):
        if max_batches is not None and i >= max_batches:
            break
        names = [os.path.splitext(os.path.basename(p))[0] for p in batch.get("video_path", [])]
        if not names:
            names = [f"sample_{i:05d}_{j}" for j in range(len(batch["video"]))]
        if skip_existing and all(
            os.path.exists(os.path.join(out_dir, n, "generated.mp4")) for n in names
        ):
            continue
        device_batch = batch_to_device(batch, tokenizer)
        key = jax.random.key(seed + i)
        local_b = len(batch["video"])
        if sharded_sampler is not None and (local_b * jax.process_count()) % mesh.size == 0:
            videos = sharded_sampler(params, device_batch, key)
        else:
            videos = model.sample(params, device_batch, key, **sample_kwargs)
        videos = np.asarray(videos)
        for j, name in enumerate(names):
            ctx = batch.get("cond_frames")
            written.append(
                log_evaluation(
                    out_dir,
                    name,
                    videos[j],
                    ground_truth=np.asarray(batch["video"][j]),
                    camera_data=np.asarray(batch["camera_data"][j]) if "camera_data" in batch else None,
                    caption=batch["caption"][j] if "caption" in batch else None,
                    context_frames=np.asarray(ctx[j]) if ctx is not None else None,
                    fps=float(np.asarray(batch.get("fps", [8.0])[j])) if "fps" in batch else 8.0,
                )
            )
            logger.info(f"[generate] wrote {written[-1]}")
    return written
