"""Parity-gate dry run: the one-command FVD gate pipeline is green end-to-end
on CPU with a tiny config + synthetic data, so the only missing piece on the
day the reference `.pt` weights land is the weights file itself
(VERDICT r4 "do this" #4; reference targets: /root/reference/README.md:18-27).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import parity_gate  # noqa: E402

from test_harness_e2e import IMG, make_e2e_workspace  # noqa: E402


# ----------------------------------------------------------------- unit level


def test_verdict_pass_fail_missing():
    row = {"fvd_videogpt": "54.1", "mse": "2500.0", "n_videos": 8}
    # 54.1 <= 53.90 * 1.01 = 54.439 -> PASS
    v = parity_gate.verdict(row, ["fvd_videogpt"], 0.01)
    assert v["pass"] and v["results"]["fvd_videogpt"]["status"] == "PASS"
    # 54.1 > 53.90 * 1.001 -> FAIL
    v = parity_gate.verdict(row, ["fvd_videogpt"], 0.001)
    assert not v["pass"] and v["results"]["fvd_videogpt"]["status"] == "FAIL"
    # better-than-reference always passes
    v = parity_gate.verdict({"mse": "1000.0"}, ["mse"], 0.01)
    assert v["pass"]
    # a requested metric absent from the row fails loudly, not silently
    v = parity_gate.verdict({}, ["fvd_stylegan"], 0.01)
    assert not v["pass"] and v["results"]["fvd_stylegan"]["status"] == "MISSING"


def test_missing_weights_exits_with_hint(tmp_path, capsys):
    args = parity_gate.parse_args(["--weights", str(tmp_path / "nope.pt")])
    with pytest.raises(SystemExit) as e:
        parity_gate.run_gate(args)
    assert "MISSING DEPENDENCY" in str(e.value)


# ------------------------------------------------------------ pipeline level


@pytest.mark.slow
def test_gate_dry_run_end_to_end(tmp_path_factory):
    """Full subprocess pipeline: orbax ckpt -> 02_generate -> 03_evaluation ->
    evaluation.csv -> verdict JSON, on the synthetic tiny workspace."""
    import jax

    from camc2v_tpu.config_yaml import build_model_from_config, load_yaml
    from camc2v_tpu.utils.checkpoint import save_checkpoint

    root, cfg_path, _ = make_e2e_workspace(tmp_path_factory.mktemp("gate"))
    model, _ = build_model_from_config(load_yaml(cfg_path))
    params = model.init_params(jax.random.key(0), (IMG, IMG))
    ckpt_dir = str(root / "gate_ckpt")
    save_checkpoint(ckpt_dir, {"params": params}, step=0)

    out_dir = str(root / "gate_out")
    os.environ["CAMC2V_FORCE_CPU"] = "1"  # subprocesses must not claim the TPU
    try:
        rc = parity_gate.main([
            "--weights", ckpt_dir, "--config", cfg_path, "--out", out_dir,
            "--num-videos", "1", "--ddim-steps", "2", "--no-fvd",
            "--metrics", "mse", "--tolerance", "1e6",
        ])
    finally:
        os.environ.pop("CAMC2V_FORCE_CPU", None)
    # tolerance 1e6 makes any finite mse pass: rc 0 proves the whole chain ran
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "generation"))
    assert os.path.exists(os.path.join(out_dir, "evaluation.csv"))
    import csv

    with open(os.path.join(out_dir, "evaluation.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows and np.isfinite(float(rows[-1]["mse"]))
