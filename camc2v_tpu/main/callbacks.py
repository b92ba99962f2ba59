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


def intermediates_report(
    intermediates: dict,
    lower_bound_warn: float = 1e-7,
    upper_bound_warn: float = 1e4,
) -> dict:
    """Per-layer stats over a flax `capture_intermediates` tree.

    The analysis half of the reference ModelWatcherCallback's activation
    capture (reference: main/callbacks.py:489-712 — per-layer NaN/Inf counts,
    under/over-bound element counts, dump to disk). Layer names are the module
    paths in call order; `first_bad` is the first layer (by call order) whose
    output contains a NaN or Inf — the divergence point when a flagship train
    run blows up mid-network.

    Returns {"layers": [record...], "first_bad": name|None, "n_bad": int}.
    """
    from collections.abc import Mapping

    # walk the raw mapping in INSERTION order: flax sows intermediates at call
    # time, so dict insertion order is call order (tree_flatten would sort
    # keys alphabetically and scramble "first bad layer")
    flat: list[tuple[str, Any]] = []

    def _walk(node, prefix):
        if isinstance(node, Mapping):
            for k, v in node.items():
                _walk(v, prefix if k == "__call__" else prefix + [str(k)])
        elif isinstance(node, (tuple, list)):
            for v in node:
                _walk(v, prefix)
        else:
            flat.append(("/".join(prefix) or "<root>", node))

    _walk(intermediates, [])

    records = []
    first_bad = None
    for name, leaf in flat:
        a = np.asarray(leaf)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        af = np.abs(a.astype(np.float64))
        n_nan = int(np.isnan(a).sum())
        n_inf = int(np.isinf(a).sum())
        fin = a[np.isfinite(a)]
        rec = {
            "layer": name,
            "shape": tuple(a.shape),
            "n_nan": n_nan,
            "n_inf": n_inf,
            "n_under": int((af < lower_bound_warn).sum()),
            "n_over": int((af > upper_bound_warn).sum()),
            "abs_max": float(np.abs(fin).max()) if fin.size else float("nan"),
            "mean": float(fin.mean()) if fin.size else float("nan"),
        }
        records.append(rec)
        if first_bad is None and (n_nan or n_inf):
            first_bad = name
    return {
        "layers": records,
        "first_bad": first_bad,
        "n_bad": sum(1 for r in records if r["n_nan"] or r["n_inf"]),
    }


class ModelWatcher(Callback):
    """Numeric sanitizer: NaN/Inf/bounds on loss, grad norm, params (debug).

    With a `probe_fn` (typically `lambda: model.debug_probe(state.params,
    batch, key)`), an alert additionally runs a capture_intermediates probe
    step, names the FIRST layer producing a NaN/Inf, and dumps the full
    per-layer report to `log_dir` — the reference ModelWatcherCallback's
    fwd-hook capture + dump-to-disk debug story (reference:
    main/callbacks.py:436-737), minus the ipdb attach (use the dumped report
    + tools instead). `probe_every > 0` also probes periodically.
    """

    def __init__(
        self,
        check_params_every: int = 100,
        param_bound: float = 1e4,
        raise_on_error: bool = True,
        probe_fn=None,
        probe_every: int = 0,
        log_dir: Optional[str] = None,
        lower_bound_warn: float = 1e-7,
        upper_bound_warn: float = 1e4,
    ):
        self.check_params_every = check_params_every
        self.param_bound = param_bound
        self.raise_on_error = raise_on_error
        self.probe_fn = probe_fn
        self.probe_every = probe_every
        self.log_dir = log_dir
        self.lower_bound_warn = lower_bound_warn
        self.upper_bound_warn = upper_bound_warn
        self.alerts: list[str] = []
        self.last_report: Optional[dict] = None

    def _alert(self, msg: str):
        if self.probe_fn is not None:
            culprit = self._probe(step=None)
            if culprit:
                msg = f"{msg}; first bad layer: {culprit}"
        self.alerts.append(msg)
        logger.error(f"[watcher] {msg}")
        if self.raise_on_error:
            raise FloatingPointError(msg)

    def _probe(self, step) -> Optional[str]:
        """Run the capture probe; dump the per-layer report; return first_bad."""
        try:
            probed = self.probe_fn()
        except Exception as e:  # noqa: BLE001 — a diagnostic must not mask the alert
            logger.error(f"[watcher] probe failed: {e}")
            return None
        inter = probed.get("intermediates", probed) if isinstance(probed, dict) else probed
        report = intermediates_report(inter, self.lower_bound_warn, self.upper_bound_warn)
        self.last_report = report
        if self.log_dir:
            import json
            import os

            os.makedirs(self.log_dir, exist_ok=True)
            tag = "alert" if step is None else f"step_{step}"
            with open(os.path.join(self.log_dir, f"watcher_{tag}.json"), "w") as f:
                json.dump(report, f, indent=1)
        if report["first_bad"]:
            logger.error(
                f"[watcher] {report['n_bad']} layers with NaN/Inf; first: "
                f"{report['first_bad']}"
            )
        return report["first_bad"]

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
        if self.probe_fn is not None and self.probe_every and step % self.probe_every == 0:
            self._probe(step)


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
