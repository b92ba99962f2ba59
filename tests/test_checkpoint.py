"""Checkpoint tests: torch-name mapping, tensor-layout transforms, orbax roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from camc2v_tpu.utils import torch_import as TI
from camc2v_tpu.nn.unet3d import UNetConfig


UNET_CFG = UNetConfig()  # flagship structure


@pytest.mark.parametrize(
    "torch_key,expected",
    [
        ("model.diffusion_model.input_blocks.0.0.weight", "unet/conv_in/weight"),
        ("model.diffusion_model.init_attn.0.proj_in.weight", "unet/init_attn/proj_in/weight"),
        ("model.diffusion_model.input_blocks.1.0.in_layers.0.weight", "unet/in_0_res/in_norm/GroupNorm_0/weight"),
        ("model.diffusion_model.input_blocks.1.0.in_layers.2.weight", "unet/in_0_res/in_conv/weight"),
        ("model.diffusion_model.input_blocks.1.0.temopral_conv.conv4.3.weight", "unet/in_0_res/temporal_conv/conv4_conv/weight"),
        ("model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_k_ip.weight", "unet/in_0_spatial/block_0/attn2/to_k_ip/weight"),
        ("model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.alpha", "unet/in_0_spatial/block_0/attn2/alpha"),
        ("model.diffusion_model.input_blocks.1.2.transformer_blocks.0.pluker_projection.weight", "unet/in_0_temporal/block_0/pluker_projection/weight"),
        ("model.diffusion_model.input_blocks.1.2.transformer_blocks.0.epipolar.epipolar_attn.to_out.0.weight", "unet/in_0_temporal/block_0/epipolar/epipolar_attn/to_out/weight"),
        ("model.diffusion_model.input_blocks.3.0.op.weight", "unet/in_2_down/op/weight"),
        ("model.diffusion_model.middle_block.2.transformer_blocks.0.ff.net.0.proj.weight", "unet/mid_temporal/block_0/ff/geglu/proj/weight"),
        # level 3 (ds 8, no attention): upsample is layer 1 of block 2
        ("model.diffusion_model.output_blocks.2.1.conv.weight", "unet/out_2_up/conv/weight"),
        # level 2 (ds 4, attention present): upsample is layer 3 of block 5
        ("model.diffusion_model.output_blocks.5.3.conv.weight", "unet/out_5_up/conv/weight"),
        ("model.diffusion_model.output_blocks.5.2.transformer_blocks.0.attn1.to_q.weight", "unet/out_5_temporal/block_0/attn1/to_q/weight"),
        ("model.diffusion_model.out.2.weight", "unet/out_conv/weight"),
        ("model.diffusion_model.time_embed.0.weight", "unet/time_embed/fc1/weight"),
        ("model.diffusion_model.framestride_embed.0.weight", "unet/fps_embedding/fc1/weight"),
        ("first_stage_model.encoder.down.0.block.1.norm1.weight", "vae/encoder/down_0_block_1/norm1/GroupNorm_0/weight"),
        ("first_stage_model.encoder.down.0.downsample.conv.weight", "vae/encoder/down_0_downsample/weight"),
        ("first_stage_model.decoder.mid.attn_1.q.weight", "vae/decoder/mid_attn_1/q/weight"),
        ("first_stage_model.quant_conv.weight", "vae/quant_conv/weight"),
        ("cond_stage_model.model.transformer.resblocks.3.attn.in_proj_weight", "clip_text/resblock_3/attn/in_proj/weight"),
        ("cond_stage_model.model.ln_final.weight", "clip_text/ln_final/LayerNorm_0/weight"),
        ("cond_stage_model.model.token_embedding.weight", "clip_text/token_embedding"),
        ("embedder.model.visual.conv1.weight", "clip_vision/conv1/weight"),
        ("embedder.model.visual.class_embedding", "clip_vision/class_embedding"),
        ("image_proj_model.layers.0.0.to_kv.weight", "image_proj/attn_0/to_kv/weight"),
        ("image_proj_model.layers.0.1.0.weight", "image_proj/ff_0/norm/LayerNorm_0/weight"),
        ("image_proj_model.timestep_embedding_func.0.weight", "image_proj/temb_fc1/weight"),
        ("pose_encoder.encoder_conv_in.weight", "pose_encoder/conv_in/weight"),
        ("pose_encoder.encoder_down_conv_blocks.1.0.down_opt.op.weight", "pose_encoder/level1_res0/down_conv/weight"),
        ("pose_encoder.encoder_down_attention_blocks.0.1.attention_blocks.0.to_out.0.weight", "pose_encoder/level0_attn1/to_out/weight"),
        ("multi_cond_latent_adaptor.layers.2.0.register_tokens", "adaptor/attn_2/register_tokens"),
        ("multi_cond_latent_adaptor.latents", "adaptor/latents"),
        ("multi_cond_in_projection.weight", "zero_conv/weight"),
    ],
)
def test_reference_key_mapping(torch_key, expected):
    assert TI.map_reference_key(torch_key, UNET_CFG) == expected


@pytest.mark.parametrize(
    "torch_key",
    [
        "betas",
        "model_ema.decay",
        "cond_stage_model.model.attn_mask",
        "embedder.model.visual.ln_post.weight",
        "logvar",
    ],
)
def test_skipped_keys(torch_key):
    assert TI.map_reference_key(torch_key, UNET_CFG) is None


def test_linear_transform_matches_torch():
    import torch

    lin = torch.nn.Linear(4, 6)
    x = torch.randn(2, 4)
    y_torch = lin(x).detach().numpy()
    kernel = TI._transform(lin.weight.detach().numpy())
    y_ours = x.numpy() @ kernel + lin.bias.detach().numpy()
    np.testing.assert_allclose(y_ours, y_torch, atol=1e-6)


def test_conv2d_transform_matches_torch():
    import torch
    import flax.linen as fnn

    conv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = torch.randn(1, 3, 8, 8)
    y_torch = conv(x).detach().numpy().transpose(0, 2, 3, 1)

    kernel = TI._transform(conv.weight.detach().numpy())
    mod = fnn.Conv(5, (3, 3), padding="SAME")
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(conv.bias.detach().numpy())}}
    y_ours = mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y_ours), y_torch, atol=1e-5)


def test_conv3d_transform_matches_torch():
    import torch
    import flax.linen as fnn

    conv = torch.nn.Conv3d(2, 4, (3, 1, 1), padding=(1, 0, 0))
    x = torch.randn(1, 2, 5, 4, 4)
    y_torch = conv(x).detach().numpy().transpose(0, 2, 3, 4, 1)
    kernel = TI._transform(conv.weight.detach().numpy())
    mod = fnn.Conv(4, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)))
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(conv.bias.detach().numpy())}}
    y_ours = mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(y_ours), y_torch, atol=1e-5)


def test_import_state_dict_roundtrip_small():
    """A fabricated reference-style state dict lands on the right leaves."""
    from camc2v_tpu.nn.resampler import Resampler

    rs = Resampler(dim=8, depth=1, dim_head=4, heads=2, num_queries=2, embedding_dim=6,
                   output_dim=8, video_length=2, use_timestep_emb=True)
    params = {"image_proj": rs.init(jax.random.key(0), jnp.zeros((1, 3, 6)))["params"]}

    rng = np.random.default_rng(0)
    sd = {
        "image_proj_model.latents": rng.normal(size=(1, 4, 8)),
        "image_proj_model.proj_in.weight": rng.normal(size=(8, 6)),
        "image_proj_model.proj_in.bias": rng.normal(size=(8,)),
    }
    new_params, report = TI.import_state_dict(sd, params, UNET_CFG)
    assert len(report["mapped"]) == 3
    assert not report["shape_mismatch"]
    np.testing.assert_allclose(
        np.asarray(new_params["image_proj"]["latents"]), sd["image_proj_model.latents"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_params["image_proj"]["proj_in"]["kernel"]),
        sd["image_proj_model.proj_in.weight"].T,
        atol=1e-6,
    )


def test_unet_mapping_covers_all_params():
    """Every leaf of a tiny camera UNet is reachable from some reference key."""
    from tests.test_camera_models import unet, EPI
    from camc2v_tpu.nn.unet3d import UNetModel

    cfg = unet(use_camera=True, epipolar=EPI, add_type="add_to_main_branch")
    model = UNetModel(cfg, dtype=jnp.float32)
    T = cfg.temporal_length
    x = jnp.zeros((1, T, 4, 4, 8))  # EPI.origin_h=32 => latent 4x4 at ds8
    ctx = jnp.zeros((1, 7 + T * 2, 16))
    cam = {
        "plucker": (jnp.zeros((1, T, 4, 4, 32)), jnp.zeros((1, T, 2, 2, 64))),
        "masks": {8: jnp.ones((1, T * 16, T * 16), bool), 16: jnp.ones((1, T * 4, T * 4), bool)},
        "cond_frame_index": jnp.zeros((1,), jnp.int32),
    }
    params = model.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32), ctx, jnp.ones((1,), jnp.int32), cam)[
        "params"
    ]
    flat = jax.tree_util.tree_flatten_with_path({"unet": params})[0]
    block_map = TI._unet_block_map(cfg)
    # invert: collect the set of our block names from the map
    mapped_blocks = set(block_map.values())
    for path, _ in flat:
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        top = s.split("/")[1]
        if top in ("time_embed", "fps_embedding", "out_norm", "out_conv", "conv_in", "init_attn"):
            continue
        assert top in mapped_blocks, f"unreachable param block: {s}"


def test_orbax_roundtrip(tmp_path):
    from camc2v_tpu.utils import checkpoint as CK

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.asarray(7)}
    CK.save_checkpoint(str(tmp_path / "ck"), state, step=7)
    assert CK.latest_step(str(tmp_path / "ck")) == 7
    target = {"params": {"w": jnp.zeros((2, 3))}, "step": jnp.asarray(0)}
    restored = CK.restore_checkpoint(str(tmp_path / "ck"), target)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7


@pytest.mark.parametrize("torch_shape", [(6, 4), (6, 4, 1), (6, 4, 3, 3), (6, 4, 2, 3, 3)])
def test_inverse_transform_roundtrips(torch_shape):
    """_inverse_transform(_transform(x)) == x for every kernel rank."""
    rng = np.random.default_rng(3)
    arr = rng.normal(size=torch_shape).astype(np.float32)
    flax_side = TI._transform(arr)
    back = TI._inverse_transform(flax_side, len(torch_shape))
    np.testing.assert_array_equal(back, arr)


def test_export_state_dict_small():
    """Export writes pytree leaves back into template keys (inverse layouts);
    import(export(params)) is the identity on the mapped leaves."""
    from camc2v_tpu.nn.resampler import Resampler

    rs = Resampler(dim=8, depth=1, dim_head=4, heads=2, num_queries=2, embedding_dim=6,
                   output_dim=8, video_length=2, use_timestep_emb=True)
    params = {"image_proj": rs.init(jax.random.key(0), jnp.zeros((1, 3, 6)))["params"]}

    rng = np.random.default_rng(1)
    template = {
        "image_proj_model.latents": rng.normal(size=(1, 4, 8)).astype(np.float32),
        "image_proj_model.proj_in.weight": rng.normal(size=(8, 6)).astype(np.float32),
        "image_proj_model.proj_in.bias": rng.normal(size=(8,)).astype(np.float32),
        "betas": np.linspace(1e-4, 2e-2, 10).astype(np.float32),  # skipped -> passthrough
    }
    out, report = TI.export_state_dict(params, template, UNET_CFG, strict=False)
    assert set(out) == set(template)
    assert len(report["exported"]) == 3
    assert report["template_passthrough"] == ["betas"]
    np.testing.assert_array_equal(out["betas"], template["betas"])
    np.testing.assert_allclose(
        out["image_proj_model.proj_in.weight"],
        np.asarray(params["image_proj"]["proj_in"]["kernel"]).T, atol=0,
    )
    # round-trip: import the export -> identical leaves
    reparams, rep2 = TI.import_state_dict(out, jax.tree_util.tree_map(np.zeros_like, params), UNET_CFG)
    assert len(rep2["mapped"]) == 3
    np.testing.assert_array_equal(
        np.asarray(reparams["image_proj"]["latents"]),
        np.asarray(params["image_proj"]["latents"]),
    )
