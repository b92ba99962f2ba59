"""End-to-end harness tests: YAML -> model -> 2 train steps -> checkpoint ->
resume -> generation directory contract. Exercises the same code paths as the
01_train/02_generate_videos CLIs (tiny config, synthetic data)."""

import json
import os

import numpy as np
import pytest
import yaml

from camc2v_tpu.data.video_io import write_video

T, IMG = 4, 32


def _pose_line(i):
    pose = np.hstack([np.eye(3), np.array([[i * 0.1], [0], [0]])]).reshape(-1)
    vals = [i * 1000, 0.9, 1.6, 0.5, 0.5, 0.0, 0.0] + pose.tolist()
    return " ".join(f"{v:.6f}" for v in vals)


def make_e2e_workspace(root):
    """Synthetic RealEstate10K-format workspace + tiny-config YAML.

    Shared by the in-process harness e2e tests and the 2-process generation
    test (tests/multihost_gen_worker.py)."""
    (root / "clips").mkdir()
    (root / "meta").mkdir()
    rng = np.random.default_rng(0)
    names = ["a", "b"]
    for name in names:
        frames = rng.integers(0, 255, (24, 48, 64, 3), dtype=np.uint8)
        write_video(str(root / "clips" / f"{name}.npz"), frames, fps=24.0)
        with open(root / "meta" / f"{name}.txt", "w") as f:
            f.write("url\n" + "\n".join(_pose_line(i) for i in range(24)) + "\n")
    (root / "list.txt").write_text("\n".join(names) + "\n")
    with open(root / "captions.json", "w") as f:
        json.dump({f"{n}.mp4": [f"scene {n}"] for n in names}, f)

    ds_params = dict(
        meta_path=str(root / "meta"),
        meta_list=str(root / "list.txt"),
        data_dir=str(root / "clips"),
        caption_file=str(root / "captions.json"),
        video_length=T,
        resolution=[IMG, IMG],
        frame_stride=[1, 2],
        video_suffix=".npz",
        additional_cond_frames="random_full",
        num_additional_cond_frames=[1, 2],
    )
    cfg = {
        "model": {
            "base_learning_rate": 1e-4,
            "target": "model.camcontexti2v.CamContextI2V",
            "params": {
                "timesteps": 20,
                "linear_start": 0.00085,
                "linear_end": 0.012,
                "loss_type": "l2_log",
                "multi_cond_strategy": "token_concat_latent_epipolar",
                "use_zero_conv_latent_input": True,
                "image_proj_model_trainable": True,
                "multi_cond_adaptor_trainable": True,
                "uncond_prob": 0.05,
                "unet_config": {"params": {
                    "in_channels": 8, "out_channels": 4, "model_channels": 32,
                    "num_res_blocks": 1, "attention_resolutions": [2, 1],
                    "channel_mult": [1, 2], "num_head_channels": 8, "context_dim": 16,
                    "temporal_length": T, "addition_attention": True,
                    "image_cross_attention": True, "fs_condition": True,
                }},
                "first_stage_config": {"params": {"embed_dim": 4, "ddconfig": {
                    "resolution": IMG, "ch": 16, "ch_mult": [1, 2, 4, 4], "num_res_blocks": 1,
                }}},
                "image_proj_stage_config": {"params": {
                    "dim": 16, "depth": 1, "dim_head": 8, "heads": 2, "num_queries": 2,
                    "embedding_dim": 16, "output_dim": 16, "video_length": T,
                    "use_timestep_emb": True,
                }},
                "clip_text_config": {"vocab_size": 64, "context_length": 7, "width": 16, "heads": 2, "layers": 2},
                "clip_vision_config": {"image_size": 224, "patch_size": 112, "width": 16, "heads": 2, "layers": 1},
                "pose_encoder_config": {"params": {
                    "downscale_factor": 8, "channels": [32, 64], "nums_rb": 1,
                    "temporal_attention_nhead": 2, "temporal_position_encoding_max_len": T,
                }},
                "epipolar_config": {
                    "origin_h": IMG, "origin_w": IMG, "attention_resolution": [2, 1],
                    "num_register_tokens": 2, "add_small_perturbation_on_zero_T": True,
                },
                "multi_latent_adaptor": {"params": {
                    "query_dim": 16, "num_queries": 16, "video_length": T,
                    "embedding_dim": 4, "output_dim": 4, "depth": 1, "dim_head": 8, "heads": 2,
                }},
                "add_type": "add_to_main_branch",
            },
        },
        "data": {"params": {"batch_size": 1, "train": {"params": ds_params},
                             "test": {"params": ds_params}}},
        "lightning": {"trainer": {"max_steps": 2, "accumulate_grad_batches": 1,
                                  "gradient_clip_val": 0.5}},
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root, str(cfg_path), cfg


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    return make_e2e_workspace(tmp_path_factory.mktemp("e2e"))


@pytest.fixture(scope="module")
def built(workspace):
    import jax

    from camc2v_tpu.config_yaml import build_model_from_config, build_train_config, load_yaml
    import jax.numpy as jnp

    root, cfg_path, _ = workspace
    cfg = load_yaml(cfg_path)
    model, pretrained = build_model_from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.key(0), (IMG, IMG))
    tr_cfg = build_train_config(cfg)
    return root, cfg, model, params, tr_cfg


def test_yaml_builds_flagship_class(built):
    from camc2v_tpu.models.camcontexti2v import CamContextI2V

    _, cfg, model, params, tr_cfg = built
    assert isinstance(model, CamContextI2V)
    assert model.config.unet.use_camera
    assert model.config.unet.epipolar is not None
    assert "adaptor" in params and "zero_conv" in params
    assert r"^adaptor/" in tr_cfg.trainable_patterns
    assert r"^image_proj/" in tr_cfg.trainable_patterns
    assert tr_cfg.max_steps == 2


def test_fit_checkpoint_resume(built):
    from camc2v_tpu.data.realestate10k import DataLoader, RealEstate10K
    from camc2v_tpu.data.tokenizer import HashTokenizer
    from camc2v_tpu.main.harness import Trainer
    from camc2v_tpu.main import callbacks as CB
    from camc2v_tpu.parallel import trainer as TR
    from camc2v_tpu.utils import checkpoint as CK

    import jax
    import jax.numpy as jnp

    root, cfg, model, params, tr_cfg = built
    tok = HashTokenizer(vocab_size=64, context_length=7)
    ds = RealEstate10K(tokenizer=tok, **cfg["data"]["params"]["train"]["params"])
    dl = DataLoader(ds, batch_size=1, shuffle=True)
    # the sharded train step donates its input state; copy so the shared
    # fixture params stay alive for the other tests
    params = jax.tree_util.tree_map(jnp.array, params)
    state = TR.init_train_state(tr_cfg, params)
    ckpt_dir = str(root / "ckpts")
    watcher = CB.ModelWatcher(raise_on_error=False)
    trainer = Trainer(
        model, tr_cfg, dl, callbacks=[watcher, CB.LiveProfiler(interval=1),
                                      CB.ProgressPrinter(interval=1, max_steps=2)],
        ckpt_dir=ckpt_dir, ckpt_every_n_steps=100, tokenizer=tok,
    )
    state = trainer.fit(state, max_steps=2, resume=False)
    assert int(state.step) == 2
    assert not watcher.alerts
    assert CK.latest_step(ckpt_dir) == 2

    # resume continues from step 2 (fresh copy — the previous fit donated)
    params2 = jax.tree_util.tree_map(jnp.array, built[3])
    state2 = TR.init_train_state(tr_cfg, params2)
    trainer2 = Trainer(model, tr_cfg, dl, ckpt_dir=ckpt_dir, tokenizer=tok)
    state2 = trainer2.fit(state2, max_steps=3, resume=True)
    assert int(state2.step) == 3


def test_generation_contract(built):
    import jax

    from camc2v_tpu.data.realestate10k import DataLoader, RealEstate10K
    from camc2v_tpu.data.tokenizer import HashTokenizer
    from camc2v_tpu.main.harness import generate_videos

    root, cfg, model, params, _ = built
    tok = HashTokenizer(vocab_size=64, context_length=7)
    ds = RealEstate10K(tokenizer=tok, **cfg["data"]["params"]["test"]["params"])
    dl = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    out_dir = str(root / "generation")
    written = generate_videos(
        model, params, dl, out_dir, tokenizer=tok,
        sample_kwargs=dict(ddim_steps=2, guidance_scale=1.0), max_batches=1,
    )
    assert len(written) == 1
    d = written[0]
    for f in ("generated.mp4", "ground_truth.mp4", "camera_data.npy", "captions.txt", "context_0.png"):
        assert os.path.exists(os.path.join(d, f)), f
    # resume skips existing
    written2 = generate_videos(
        model, params, dl, out_dir, tokenizer=tok,
        sample_kwargs=dict(ddim_steps=2, guidance_scale=1.0), max_batches=1, skip_existing=True,
    )
    assert len(written2) == 0


# ------------------------- Image2Video runtime engine -------------------------

def test_image2video_engine_chunks(workspace, tmp_path):
    """Lazy build + trajectory pipeline + auto-regressive chunked generation.

    reference: main/runtime.py:139-346 (get_image), 168-201 (trajectory).
    """
    import jax.numpy as jnp

    from camc2v_tpu.main.runtime import Image2Video

    root, cfg_path, _ = workspace
    rng = np.random.default_rng(0)
    engine = Image2Video(
        {"tiny": cfg_path}, result_dir=str(tmp_path), video_length=T,
        resolution=(IMG, IMG), dtype=jnp.float32,  # bf16 is emulated on CPU
    )
    img = rng.integers(0, 255, (40, 52, 3)).astype(np.uint8)
    w2c = np.tile(np.eye(4, dtype=np.float64), (3, 1, 1))
    w2c[:, 0, 3] = [0.0, 0.1, 0.2]
    ctx = rng.uniform(-1, 1, (1, IMG, IMG, 3)).astype(np.float32)
    path = engine.get_image(
        "tiny", img, "a tiny room", trajectory=w2c,
        context_frames=ctx, num_chunks=2, ddim_steps=2,
        bezier_coef_a=0.3, bezier_coef_b=0.7,
        save_name="demo",
    )
    assert path.endswith("demo.mp4") and os.path.exists(path)
    from camc2v_tpu.data.video_io import VideoReader

    r = VideoReader(path)
    frames = r.read_all()
    r.close()
    # chunk 0 keeps all T frames; chunk 1 drops its duplicated first frame
    assert frames.shape == (2 * T - 1, IMG, IMG, 3)
    assert "tiny" in engine._models  # lazy cache populated


def test_04_visualize_cli_headless(workspace, tmp_path, monkeypatch):
    """Drive the 04_visualize.py headless CLI end-to-end (tiny config).

    reference: CamContextI2V/04_visualize.py:33-315.
    """
    import runpy
    import sys

    import cv2

    root, cfg_path, _ = workspace
    img_path = tmp_path / "in.png"
    rng = np.random.default_rng(1)
    cv2.imwrite(str(img_path), rng.integers(0, 255, (40, 52, 3)).astype(np.uint8))
    traj_path = tmp_path / "traj.txt"
    rows = []
    for i in range(3):
        rt = np.hstack([np.eye(3), [[0.1 * i], [0.0], [0.0]]]).reshape(-1)
        rows.append(" ".join(f"{v:.6f}" for v in rt))
    traj_path.write_text("\n".join(rows))

    out_dir = tmp_path / "demo"
    monkeypatch.setattr(
        sys, "argv",
        ["04_visualize.py", "--models", f"tiny={cfg_path}",
         "--image", str(img_path), "--prompt", "hello world",
         "--trajectory", str(traj_path), "--ddim-steps", "2",
         "--video-length", str(T), "--resolution", str(IMG), str(IMG),
         "--dtype", "float32", "--out", str(out_dir)],
    )
    script = os.path.join(os.path.dirname(__file__), "..", "04_visualize.py")
    runpy.run_path(script, run_name="__main__")
    vids = [f for f in os.listdir(out_dir) if f.endswith(".mp4")]
    assert len(vids) == 1
