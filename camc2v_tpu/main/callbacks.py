"""Training callbacks: media logging, profiling, numeric sanitising, progress.

TPU-native equivalents of the reference's Lightning callbacks
(reference: CamContextI2V/main/callbacks.py):
  * ImageLogger (:44-262)       -> `ImageLogger` — periodic sample generation,
    per-video test-mode directories via utils/save_video.log_evaluation;
  * LiveProfiler (:381-433)     -> `LiveProfiler` — EMA wall-times for
    data/step phases;
  * CUDACallback (:266-318)     -> `DeviceMonitor` — per-interval step time +
    device memory stats (jax.local_devices()[0].memory_stats());
  * ModelWatcherCallback (:436-737) -> `ModelWatcher` — NaN/Inf/bounds checks
    over loss, params and grad-norm each step (debug mode);
  * PrintProgressCallback (:320-377) -> `ProgressPrinter` — smoothed ETA.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Optional

import numpy as np

logger = logging.getLogger("camc2v")


class Callback:
    def on_train_batch_start(self, step: int): ...

    def on_train_batch_end(self, step: int, state, metrics: dict): ...

    def on_data_loaded(self, step: int): ...


class LiveProfiler(Callback):
    """EMA-smoothed timings for the data-load and optimise phases."""

    def __init__(self, interval: int = 10, smooth_coeff: float = 0.9, max_steps: Optional[int] = None):
        self.interval = interval
        self.alpha = smooth_coeff
        self.max_steps = max_steps
        self._t_start = None
        self._t_data = None
        self.data_time = None
        self.step_time = None

    def on_train_batch_start(self, step):
        self._t_start = time.perf_counter()

    def on_data_loaded(self, step):
        if self._t_start is None:
            return
        dt = time.perf_counter() - self._t_start
        self.data_time = dt if self.data_time is None else self.alpha * self.data_time + (1 - self.alpha) * dt
        self._t_data = time.perf_counter()

    def on_train_batch_end(self, step, state, metrics):
        if self._t_data is None:
            return
        dt = time.perf_counter() - self._t_data
        self.step_time = dt if self.step_time is None else self.alpha * self.step_time + (1 - self.alpha) * dt
        if self.max_steps and step >= self.max_steps:
            return
        if step % self.interval == 0:
            logger.info(
                f"[profiler] step={step} data={self.data_time:.3f}s optim={self.step_time:.3f}s"
            )


class DeviceMonitor(Callback):
    """Step time + device memory (the CUDACallback analogue)."""

    def __init__(self, interval: int = 100):
        self.interval = interval
        self._t = None

    def on_train_batch_start(self, step):
        self._t = time.perf_counter()

    def on_train_batch_end(self, step, state, metrics):
        if step % self.interval != 0 or self._t is None:
            return
        import jax

        dt = time.perf_counter() - self._t
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        logger.info(f"[device] step={step} step_time={dt:.3f}s peak_hbm={peak:.2f}GiB")


class ModelWatcher(Callback):
    """Numeric sanitizer: NaN/Inf/bounds on loss, grad norm, params (debug)."""

    def __init__(self, check_params_every: int = 100, param_bound: float = 1e4, raise_on_error: bool = True):
        self.check_params_every = check_params_every
        self.param_bound = param_bound
        self.raise_on_error = raise_on_error
        self.alerts: list[str] = []

    def _alert(self, msg: str):
        self.alerts.append(msg)
        logger.error(f"[watcher] {msg}")
        if self.raise_on_error:
            raise FloatingPointError(msg)

    def on_train_batch_end(self, step, state, metrics):
        loss = float(metrics.get("loss", 0.0))
        if not np.isfinite(loss):
            self._alert(f"non-finite loss at step {step}: {loss}")
        gn = metrics.get("grad_norm")
        if gn is not None and not np.isfinite(float(gn)):
            self._alert(f"non-finite grad norm at step {step}")
        if state is not None and step % self.check_params_every == 0:
            import jax

            leaves = jax.tree_util.tree_leaves(state.params)
            finite = all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves[:50])
            if not finite:
                self._alert(f"non-finite parameters at step {step}")


class ProgressPrinter(Callback):
    """Smoothed ETA logging (the PrintProgressCallback analogue)."""

    def __init__(self, interval: int = 20, max_steps: int = 50000):
        self.interval = interval
        self.max_steps = max_steps
        self._t0 = time.perf_counter()
        self._step0 = None

    def on_train_batch_end(self, step, state, metrics):
        if self._step0 is None:
            self._step0 = step
            self._t0 = time.perf_counter()
            return
        if step % self.interval != 0 or step == self._step0:
            return
        rate = (step - self._step0) / (time.perf_counter() - self._t0)
        eta_s = (self.max_steps - step) / max(rate, 1e-9)
        logger.info(
            f"[progress] step={step}/{self.max_steps} loss={float(metrics.get('loss', 0)):.4f} "
            f"({rate:.2f} it/s, ETA {eta_s/3600:.1f}h)"
        )


class MetricsLogger(Callback):
    """Scalar logging through pluggable sinks (CSV / TensorBoard / wandb).

    reference: self.log_dict -> Lightning logger (utils_train.py:111-150).
    With no explicit sinks, logs CSV + TensorBoard (the zero-egress analogue
    of the reference's wandb default).
    """

    def __init__(self, logdir: str, interval: int = 50, sinks=None):
        from camc2v_tpu.main.loggers import build_sinks

        self.sinks = sinks if sinks is not None else build_sinks(None, logdir)
        self.interval = interval

    def on_train_batch_end(self, step, state, metrics):
        if step % self.interval != 0 or not metrics:
            return
        scalars = {
            k: float(v)
            for k, v in metrics.items()
            if np.isscalar(v) or getattr(v, "ndim", 1) == 0
        }
        for sink in self.sinks:
            sink.log_scalars(step, scalars)

    def close(self):
        for sink in self.sinks:
            sink.close()


class ImageLogger(Callback):
    """Periodic sample generation during training + test-mode per-video dirs.

    reference: main/callbacks.py:44-262. The heavy lifting (model.sample +
    log_evaluation) is injected as `sample_fn(step) -> None` by the harness.
    """

    def __init__(self, every_n_steps: int = 2500, sample_fn=None, log_first_iteration: bool = False):
        self.every_n_steps = every_n_steps
        self.sample_fn = sample_fn
        self.log_first_iteration = log_first_iteration

    def on_train_batch_end(self, step, state, metrics):
        if self.sample_fn is None:
            return
        if (step % self.every_n_steps == 0 and step > 0) or (step == 1 and self.log_first_iteration):
            self.sample_fn(step)
