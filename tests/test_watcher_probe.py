"""ModelWatcher debug probe: per-layer intermediate capture names the layer
that produced a NaN (reference ModelWatcherCallback parity — fwd-hook capture,
NaN/Inf/bounds per layer, dump-to-disk; reference main/callbacks.py:436-737).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from camc2v_tpu.main.callbacks import ModelWatcher, intermediates_report

from test_dynamicrafter import _batch, tiny_config  # noqa: E402


def _model_and_params():
    from camc2v_tpu.models.dynamicrafter import DynamiCrafter

    model = DynamiCrafter(tiny_config(), dtype=jnp.float32)
    params = model.init_params(jax.random.key(0), image_hw=(32, 32))
    return model, params


def _poison_middle_block(params):
    """NaN a kernel inside the UNet middle block; returns the leaf path."""
    unet = params["unet"]
    mid_keys = [k for k in unet if k.startswith("mid_")]
    assert mid_keys, f"no middle-block params found: {sorted(unet)[:10]}"
    node = unet[mid_keys[0]]
    path = [mid_keys[0]]
    while isinstance(node, dict):
        k = "kernel" if "kernel" in node else next(iter(node))
        path.append(k)
        if not isinstance(node[k], dict):
            node[k] = jnp.full_like(node[k], jnp.nan)
            break
        node = node[k]
    return "/".join(path)


def test_probe_names_offending_layer(tmp_path):
    model, params = _model_and_params()
    poisoned = _poison_middle_block(params)

    probed = model.debug_probe(params, _batch(), jax.random.key(1))
    assert not np.isfinite(np.asarray(probed["output"])).all()  # NaN propagated
    report = intermediates_report(probed["intermediates"])
    assert report["first_bad"] is not None, "probe must name a layer"
    assert report["n_bad"] >= 1
    # the FIRST bad layer (call order) sits in the poisoned middle block —
    # everything upstream (input blocks) is clean
    assert "mid_" in report["first_bad"], (report["first_bad"], poisoned)
    by_name = {r["layer"]: r for r in report["layers"]}
    clean_inputs = [n for n in by_name if n.startswith("in_")]
    assert clean_inputs and all(
        by_name[n]["n_nan"] == 0 and by_name[n]["n_inf"] == 0 for n in clean_inputs
    )


def test_probe_clean_model_reports_no_bad_layers():
    model, params = _model_and_params()
    probed = model.debug_probe(params, _batch(), jax.random.key(1))
    report = intermediates_report(probed["intermediates"])
    assert report["first_bad"] is None
    assert report["n_bad"] == 0
    assert len(report["layers"]) > 10  # captured a real per-layer tree
    # bounds accounting present on every record
    for r in report["layers"]:
        assert {"n_under", "n_over", "abs_max"} <= set(r)


def test_watcher_alert_runs_probe_and_dumps(tmp_path):
    model, params = _model_and_params()
    _poison_middle_block(params)
    probe = lambda: model.debug_probe(params, _batch(), jax.random.key(1))
    w = ModelWatcher(raise_on_error=False, probe_fn=probe, log_dir=str(tmp_path))
    w.on_train_batch_end(step=7, state=None, metrics={"loss": float("nan")})
    assert w.alerts and "first bad layer" in w.alerts[0]
    assert "mid_" in w.alerts[0]
    dumped = [f for f in os.listdir(tmp_path) if f.startswith("watcher_")]
    assert dumped
    with open(tmp_path / dumped[0]) as f:
        report = json.load(f)
    assert report["first_bad"] and "mid_" in report["first_bad"]


def test_watcher_periodic_probe():
    model, params = _model_and_params()
    calls = []

    def probe():
        calls.append(1)
        return model.debug_probe(params, _batch(), jax.random.key(1))

    w = ModelWatcher(raise_on_error=True, probe_fn=probe, probe_every=2)
    w.on_train_batch_end(step=1, state=None, metrics={"loss": 0.5})
    w.on_train_batch_end(step=2, state=None, metrics={"loss": 0.5})
    assert len(calls) == 1 and w.last_report is not None
    assert not w.alerts
