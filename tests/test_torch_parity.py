"""Numerical parity vs PyTorch for the conventions the reference depends on.

The reference's quality numbers depend on exact GroupNorm/LayerNorm/GELU/
attention semantics (SURVEY §6 'hard parts': GroupNorm fp32 upcast, attention
numerics). These tests load IDENTICAL weights into torch modules and our flax
modules and compare outputs, catching convention drift (eps, activations,
weight layouts) that shape tests cannot see.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

RTOL = 2e-5
ATOL = 2e-5


def test_groupnorm_parity():
    from camc2v_tpu.nn.layers import GroupNorm32

    tg = torch.nn.GroupNorm(4, 16, eps=1e-5)
    torch.nn.init.normal_(tg.weight)
    torch.nn.init.normal_(tg.bias)
    x = torch.randn(2, 16, 8, 8)

    ours = GroupNorm32(num_groups=4)
    params = {"params": {"GroupNorm_0": {
        "scale": jnp.asarray(tg.weight.detach().numpy()),
        "bias": jnp.asarray(tg.bias.detach().numpy()),
    }}}
    out = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    ref = tg(x).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)


def test_layernorm_parity():
    from camc2v_tpu.nn.layers import LayerNormF32

    tl = torch.nn.LayerNorm(32)
    torch.nn.init.normal_(tl.weight)
    torch.nn.init.normal_(tl.bias)
    x = torch.randn(3, 7, 32)
    ours = LayerNormF32()
    params = {"params": {"LayerNorm_0": {
        "scale": jnp.asarray(tl.weight.detach().numpy()),
        "bias": jnp.asarray(tl.bias.detach().numpy()),
    }}}
    out = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), tl(x).detach().numpy(), rtol=RTOL, atol=ATOL)


def test_geglu_parity():
    """reference: lvdm/modules/attention.py:431-438 (x * gelu(gate), exact gelu)."""
    from camc2v_tpu.nn.attention import GEGLU

    proj = torch.nn.Linear(8, 12)
    x = torch.randn(2, 5, 8)
    a, gate = proj(x).chunk(2, dim=-1)
    ref = (a * torch.nn.functional.gelu(gate)).detach().numpy()

    ours = GEGLU(dim_out=6)
    params = {"params": {"proj": {
        "kernel": jnp.asarray(proj.weight.detach().numpy().T),
        "bias": jnp.asarray(proj.bias.detach().numpy()),
    }}}
    out = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_cross_attention_self_parity():
    """Bias-free q/k/v + softmax attention vs the reference einsum formula
    (lvdm/modules/attention.py:105-129)."""
    from camc2v_tpu.nn.attention import CrossAttention

    dim, heads, d_head = 16, 2, 8
    torch.manual_seed(0)
    wq = torch.randn(dim, dim) * 0.1
    wk = torch.randn(dim, dim) * 0.1
    wv = torch.randn(dim, dim) * 0.1
    wo = torch.randn(dim, dim) * 0.1
    bo = torch.randn(dim) * 0.1
    x = torch.randn(2, 6, dim)

    # reference formula
    q = (x @ wq.T).reshape(2, 6, heads, d_head).permute(0, 2, 1, 3)
    k = (x @ wk.T).reshape(2, 6, heads, d_head).permute(0, 2, 1, 3)
    v = (x @ wv.T).reshape(2, 6, heads, d_head).permute(0, 2, 1, 3)
    sim = torch.einsum("bhid,bhjd->bhij", q, k) * (d_head**-0.5)
    attn = sim.softmax(dim=-1)
    out = torch.einsum("bhij,bhjd->bhid", attn, v)
    out = out.permute(0, 2, 1, 3).reshape(2, 6, dim)
    ref = (out @ wo.T + bo).detach().numpy()

    ours = CrossAttention(query_dim=dim, heads=heads, dim_head=d_head)
    params = {"params": {
        "to_q": {"kernel": jnp.asarray(wq.numpy().T)},
        "to_k": {"kernel": jnp.asarray(wk.numpy().T)},
        "to_v": {"kernel": jnp.asarray(wv.numpy().T)},
        "to_out": {"kernel": jnp.asarray(wo.numpy().T), "bias": jnp.asarray(bo.numpy())},
    }}
    got = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_timestep_embedding_parity():
    """reference: lvdm/models/utils_diffusion.py:8-28 ([cos | sin] order)."""
    import math

    from camc2v_tpu.core.schedules import timestep_embedding

    dim = 64
    ts = torch.tensor([0.0, 17.0, 999.0])
    half = dim // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    args = ts[:, None] * freqs[None]
    ref = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    out = timestep_embedding(jnp.asarray(ts.numpy()), dim)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_silu_conv_resblock_core_parity():
    """GN -> SiLU -> Conv3x3 chain with identical weights (the ResBlock core)."""
    from camc2v_tpu.nn.layers import Conv, GroupNorm32

    import flax.linen as fnn

    tg = torch.nn.GroupNorm(4, 8)
    tc = torch.nn.Conv2d(8, 8, 3, padding=1)
    x = torch.randn(1, 8, 6, 6)
    ref = tc(torch.nn.functional.silu(tg(x))).detach().numpy().transpose(0, 2, 3, 1)

    class Core(fnn.Module):
        @fnn.compact
        def __call__(self, h):
            h = GroupNorm32(num_groups=4, name="norm")(h)
            h = fnn.silu(h)
            return Conv(8, (3, 3), name="conv")(h)

    params = {"params": {
        "norm": {"GroupNorm_0": {
            "scale": jnp.asarray(tg.weight.detach().numpy()),
            "bias": jnp.asarray(tg.bias.detach().numpy()),
        }},
        "conv": {
            "kernel": jnp.asarray(tc.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(tc.bias.detach().numpy()),
        },
    }}
    out = Core().apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_clip_attention_parity():
    """CLIP resblock MHA vs torch.nn.MultiheadAttention with shared weights."""
    from camc2v_tpu.nn.clip import CLIPAttention

    width, heads = 16, 2
    mha = torch.nn.MultiheadAttention(width, heads, batch_first=True)
    x = torch.randn(2, 5, width)
    ref = mha(x, x, x, need_weights=False)[0].detach().numpy()

    ours = CLIPAttention(width, heads)
    params = {"params": {
        "in_proj": {
            "kernel": jnp.asarray(mha.in_proj_weight.detach().numpy().T),
            "bias": jnp.asarray(mha.in_proj_bias.detach().numpy()),
        },
        "out_proj": {
            "kernel": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
        },
    }}
    out = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_temporal_transformer_cross_attention_parity():
    """only_self_att=False: temporal cross-attention vs the reference module
    (lvdm/modules/attention.py:323-428, the `else` context branch :405-419).

    Config-dead at flagship (temporal_selfatt_only: true everywhere), but the
    mode must not silently degrade to self-attention (VERDICT r3 weak #4).
    """
    import pathlib
    import sys

    sys.path.append(str(pathlib.Path(__file__).parent / "oracle"))
    import refload

    refload.load_reference()
    from lvdm.modules.attention import TemporalTransformer as RefTT

    from camc2v_tpu.nn.attention import TemporalTransformer

    C, heads, d_head, ctx_dim = 32, 2, 16, 8
    b, t, hh, ww = 1, 4, 4, 4
    torch.manual_seed(0)
    ref = RefTT(C, heads, d_head, depth=1, context_dim=ctx_dim, use_checkpoint=False,
                use_linear=True, only_self_att=False, temporal_length=t)
    ref.eval()
    # randomize so the zero-init proj_out contributes
    sd = {k: torch.randn_like(v) * 0.1 for k, v in ref.state_dict().items()}
    ref.load_state_dict(sd)

    mine = TemporalTransformer(in_channels=C, n_heads=heads, d_head=d_head, depth=1,
                               only_self_att=False, context_dim=ctx_dim,
                               temporal_length=t, dtype=jnp.float32)

    def k(name):
        return jnp.asarray(sd[name].numpy().T if sd[name].ndim == 2 else sd[name].numpy())

    params = {"params": {
        "norm": {"GroupNorm_0": {"scale": k("norm.weight"), "bias": k("norm.bias")}},
        "proj_in": {"kernel": k("proj_in.weight"), "bias": k("proj_in.bias")},
        "proj_out": {"kernel": k("proj_out.weight"), "bias": k("proj_out.bias")},
        "block_0": {
            "norm1": {"LayerNorm_0": {"scale": k("transformer_blocks.0.norm1.weight"),
                                      "bias": k("transformer_blocks.0.norm1.bias")}},
            "norm2": {"LayerNorm_0": {"scale": k("transformer_blocks.0.norm2.weight"),
                                      "bias": k("transformer_blocks.0.norm2.bias")}},
            "norm3": {"LayerNorm_0": {"scale": k("transformer_blocks.0.norm3.weight"),
                                      "bias": k("transformer_blocks.0.norm3.bias")}},
            "attn1": {
                "to_q": {"kernel": k("transformer_blocks.0.attn1.to_q.weight")},
                "to_k": {"kernel": k("transformer_blocks.0.attn1.to_k.weight")},
                "to_v": {"kernel": k("transformer_blocks.0.attn1.to_v.weight")},
                "to_out": {"kernel": k("transformer_blocks.0.attn1.to_out.0.weight"),
                           "bias": k("transformer_blocks.0.attn1.to_out.0.bias")},
            },
            "attn2": {
                "to_q": {"kernel": k("transformer_blocks.0.attn2.to_q.weight")},
                "to_k": {"kernel": k("transformer_blocks.0.attn2.to_k.weight")},
                "to_v": {"kernel": k("transformer_blocks.0.attn2.to_v.weight")},
                "to_out": {"kernel": k("transformer_blocks.0.attn2.to_out.0.weight"),
                           "bias": k("transformer_blocks.0.attn2.to_out.0.bias")},
            },
            "ff": {
                "geglu": {"proj": {"kernel": k("transformer_blocks.0.ff.net.0.proj.weight"),
                                   "bias": k("transformer_blocks.0.ff.net.0.proj.bias")}},
                "fc2": {"kernel": k("transformer_blocks.0.ff.net.2.weight"),
                        "bias": k("transformer_blocks.0.ff.net.2.bias")},
            },
        },
    }}

    rng = np.random.default_rng(5)
    x = rng.normal(size=(b, C, t, hh, ww)).astype(np.float32)
    ctx = rng.normal(size=(b * t, 3, ctx_dim)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), context=torch.from_numpy(ctx)).numpy()

    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # (B, T, H, W, C)
    got = mine.apply(params, xj, jnp.asarray(ctx))
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, out_ref, rtol=1e-4, atol=2e-4)

    # and the degenerate guard: context must actually change the output
    got_noctx_params = mine.apply(params, xj, jnp.asarray(ctx * 0.0))
    assert not np.allclose(np.asarray(got_noctx_params).transpose(0, 4, 1, 2, 3), out_ref,
                           rtol=1e-4, atol=2e-4)
