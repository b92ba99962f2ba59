"""Fused temporal-attention kernel: parity vs the XLA path (interpret mode).

The kernel packs 128//T sequences per tile and masks the cross-sequence
score blocks with an additive penalty — these tests pin that the packing,
per-head weight slicing, and out-projection fusion reproduce the plain
einsum attention (ops/attention.py::_xla_attention semantics) and that the
recompute VJP delivers weight gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camc2v_tpu.ops import temporal_attention as ta
from camc2v_tpu.ops.attention import dot_product_attention


def _mk(n, t, c_in, heads, dim_head, c_out, seed=0):
    rng = np.random.default_rng(seed)
    inner = heads * dim_head
    x = jnp.asarray(rng.normal(size=(n, t, c_in)), jnp.bfloat16)
    wq = jnp.asarray(rng.normal(size=(c_in, inner)) * 0.05, jnp.float32)
    wk = jnp.asarray(rng.normal(size=(c_in, inner)) * 0.05, jnp.float32)
    wv = jnp.asarray(rng.normal(size=(c_in, inner)) * 0.05, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(inner, c_out)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(c_out,)) * 0.1, jnp.float32)
    return x, wq, wk, wv, wo, bo


def _xla_reference(x, wq, wk, wv, wo, bo, heads):
    inner = wq.shape[1]
    d = inner // heads
    xb = x.astype(jnp.bfloat16)
    q = (xb @ wq.astype(jnp.bfloat16)).reshape(*x.shape[:2], heads, d)
    k = (xb @ wk.astype(jnp.bfloat16)).reshape(*x.shape[:2], heads, d)
    v = (xb @ wv.astype(jnp.bfloat16)).reshape(*x.shape[:2], heads, d)
    out = dot_product_attention(q, k, v)
    out = out.reshape(*x.shape[:2], inner)
    return (out @ wo.astype(jnp.bfloat16)).astype(jnp.float32) + bo


@pytest.mark.parametrize(
    "n,t,c_in,heads,dim_head,c_out",
    [
        (32, 16, 320, 5, 64, 320),   # flagship ds1 temporal shape (small n)
        (48, 16, 320, 8, 64, 320),   # init_attn: c_in=320? no — inner 512
        (16, 8, 256, 4, 64, 256),    # T=8 packing (16 sequences/tile)
        (24, 16, 320, 5, 64, 256),   # c_out != c_in
    ],
)
def test_kernel_matches_xla(n, t, c_in, heads, dim_head, c_out):
    x, wq, wk, wv, wo, bo = _mk(n, t, c_in, heads, dim_head, c_out)
    assert ta.supported(n, t, c_in, c_out, heads, dim_head)
    got = ta.fused_temporal_mha(x, wq, wk, wv, wo, bo, heads=heads)
    assert got.shape == (n, t, c_out)
    assert got.dtype == x.dtype
    want = _xla_reference(x, wq, wk, wv, wo, bo, heads)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.06, rtol=0.05,
    )


def test_kernel_packing_independence():
    """Sequences must not leak into each other across the packed tile."""
    n, t, c, heads, d = 16, 16, 320, 5, 64
    x, wq, wk, wv, wo, bo = _mk(n, t, c, heads, d, c)
    full = ta.fused_temporal_mha(x, wq, wk, wv, wo, bo, heads=heads)
    # perturb one sequence; all others must be bit-identical
    x2 = x.at[3].set(x[3] + 1.0)
    full2 = ta.fused_temporal_mha(x2, wq, wk, wv, wo, bo, heads=heads)
    same = np.asarray(full) == np.asarray(full2)
    assert not same[3].all()
    mask = np.ones(n, bool)
    mask[3] = False
    assert same[mask].all()


def test_vjp_matches_xla_grads():
    n, t, c, heads, d = 16, 16, 256, 4, 64
    x, wq, wk, wv, wo, bo = _mk(n, t, c, heads, d, c)

    def loss_fused(params):
        out = ta.fused_temporal_mha(x, *params, heads=heads)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_xla(params):
        out = _xla_reference(x, *params, heads=heads)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    params = (wq, wk, wv, wo, bo)
    g_fused = jax.grad(loss_fused)(params)
    g_xla = jax.grad(loss_xla)(params)
    for gf, gx, name in zip(g_fused, g_xla, ["wq", "wk", "wv", "wo", "bo"]):
        assert bool(jnp.all(jnp.isfinite(gf))), name
        denom = np.abs(np.asarray(gx)).max() + 1e-6
        rel = np.abs(np.asarray(gf, np.float32) - np.asarray(gx, np.float32)).max() / denom
        assert rel < 0.05, (name, rel)


def test_cross_attention_module_dispatch():
    """CrossAttention fused path: identical param tree, matching outputs."""
    from camc2v_tpu.nn.attention import CrossAttention

    n, t, c = 16, 16, 320
    heads, d = 5, 64
    x = jnp.asarray(np.random.default_rng(1).normal(size=(n, t, c)), jnp.bfloat16)
    mod = CrossAttention(query_dim=c, heads=heads, dim_head=d, dtype=jnp.bfloat16)

    ta.use_fused(True)
    try:
        params_fused = mod.init(jax.random.key(0), x)
        out_fused = mod.apply(params_fused, x)
    finally:
        ta.use_fused(None)

    params_plain = mod.init(jax.random.key(0), x)
    out_plain = mod.apply(params_plain, x)

    # identical parameter trees (paths AND values — DenseParams must mirror Dense)
    flat_f = jax.tree_util.tree_leaves_with_path(params_fused)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(params_plain))
    assert len(flat_f) == len(flat_p)
    for path, leaf in flat_f:
        assert path in flat_p, path
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_p[path]))

    np.testing.assert_allclose(
        np.asarray(out_fused, np.float32), np.asarray(out_plain, np.float32),
        atol=0.06, rtol=0.05,
    )


def test_ln_residual_fused_matches_module_chain():
    """ln_scale/ln_bias + residual=True == LayerNormF32 -> attn -> + x."""
    from camc2v_tpu.nn.layers import LayerNormF32

    n, t, c, heads, d = 16, 16, 320, 5, 64
    x, wq, wk, wv, wo, bo = _mk(n, t, c, heads, d, c, seed=7)
    rng = np.random.default_rng(8)
    ls = jnp.asarray(rng.normal(size=(c,)) * 0.2 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)

    got = ta.fused_temporal_mha(
        x, wq, wk, wv, wo, bo, heads=heads, ln_scale=ls, ln_bias=lb, residual=True
    )

    ln = LayerNormF32()
    normed = ln.apply({"params": {"LayerNorm_0": {"scale": ls, "bias": lb}}}, x)
    want = _xla_reference(normed, wq, wk, wv, wo, bo, heads) + x.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.08, rtol=0.05,
    )


def test_ln_fused_vjp_finite():
    n, t, c, heads, d = 8, 16, 256, 4, 64
    x, wq, wk, wv, wo, bo = _mk(n, t, c, heads, d, c, seed=9)
    ls = jnp.ones((c,), jnp.float32)
    lb = jnp.zeros((c,), jnp.float32)

    def loss(p):
        wq_, wk_, wv_, wo_, bo_, ls_, lb_ = p
        out = ta.fused_temporal_mha(
            x, wq_, wk_, wv_, wo_, bo_, heads=heads,
            ln_scale=ls_, ln_bias=lb_, residual=True,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)((wq, wk, wv, wo, bo, ls, lb))
    for g, name in zip(grads, ["wq", "wk", "wv", "wo", "bo", "ls", "lb"]):
        assert bool(jnp.all(jnp.isfinite(g))), name
        assert float(jnp.abs(g).max()) > 0, name  # all params reached


def test_block_fused_ln_attn_dispatch():
    """BasicTransformerBlock temporal path: fused LN+attn1/attn2 on vs off —
    identical param tree, matching outputs."""
    from camc2v_tpu.nn.attention import BasicTransformerBlock
    from camc2v_tpu.ops import geglu_ff as gff

    n, t, c = 16, 16, 256
    x = jnp.asarray(np.random.default_rng(4).normal(size=(n, t, c)), jnp.bfloat16)
    mod = BasicTransformerBlock(dim=c, n_heads=4, d_head=64, dtype=jnp.bfloat16,
                                is_temporal=True)

    ta.use_fused(True)
    gff.use_fused(True)
    try:
        params_fused = mod.init(jax.random.key(0), x)
        out_fused = mod.apply(params_fused, x)
    finally:
        ta.use_fused(None)
        gff.use_fused(None)
    params_plain = mod.init(jax.random.key(0), x)
    out_plain = mod.apply(params_plain, x)

    flat_f = jax.tree_util.tree_leaves_with_path(params_fused)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(params_plain))
    assert len(flat_f) == len(flat_p)
    for path, leaf in flat_f:
        assert path in flat_p, path
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_p[path]))

    np.testing.assert_allclose(
        np.asarray(out_fused, np.float32), np.asarray(out_plain, np.float32),
        atol=0.1, rtol=0.05,
    )


def test_temporal_transformer_fused_integration():
    """Whole TemporalTransformer (norm+proj+blocks) with fused attention on
    vs off — catches dispatch-condition mistakes inside the real module."""
    from camc2v_tpu.nn.attention import TemporalTransformer

    b, t, hh, ww, c = 1, 16, 4, 4, 256
    x = jnp.asarray(np.random.default_rng(2).normal(size=(b, t, hh, ww, c)), jnp.bfloat16)
    mod = TemporalTransformer(
        in_channels=c, n_heads=4, d_head=64, temporal_length=t, dtype=jnp.bfloat16
    )
    params = mod.init(jax.random.key(0), x)

    ta.use_fused(True)
    try:
        out_fused = mod.apply(params, x)
    finally:
        ta.use_fused(None)
    out_plain = mod.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_fused, np.float32), np.asarray(out_plain, np.float32),
        atol=0.08, rtol=0.05,
    )


def test_supported_predicate_gates(monkeypatch):
    assert not ta.supported(15, 16, 320, 320, 5, 64)     # n not multiple of pack
    assert not ta.supported(16, 16, 96, 96, 2, 48)       # c too small / d%8
    assert not ta.supported(16, 48, 320, 320, 5, 64)     # T doesn't divide 128
    # C=1280 (heads=20, ~13.1 MB resident weights) is admitted by the 14 MB
    # round-5 INFERENCE default, rejected by the 8 MB TRAIN default (its
    # custom VJP measured +15.7 ms/step vs XLA at flagship), and rejected
    # again under an explicit 8 MB inference budget
    assert ta.supported(32, 16, 1280, 1280, 20, 64)
    assert not ta.supported(32, 16, 1280, 1280, 20, 64, training=True)
    monkeypatch.setenv("CAMC2V_TEMPORAL_MAX_WEIGHT_MB_TRAIN", "14")
    assert ta.supported(32, 16, 1280, 1280, 20, 64, training=True)
    monkeypatch.delenv("CAMC2V_TEMPORAL_MAX_WEIGHT_MB_TRAIN")
    monkeypatch.setenv("CAMC2V_TEMPORAL_MAX_WEIGHT_MB", "8")
    assert not ta.supported(32, 16, 1280, 1280, 20, 64)
    monkeypatch.delenv("CAMC2V_TEMPORAL_MAX_WEIGHT_MB")
    assert ta.supported(2048, 16, 320, 320, 5, 64)
    assert ta.supported(2048, 16, 320, 512, 8, 64)       # init_attn: 320 -> inner 512


def test_kernel_big_weight_budget_c1280(monkeypatch):
    """The ds32/ds64 shape (heads=20, C=1280) needs ~13.1 MB of resident
    weights — admitted by the round-5 14 MB default (measured 152.1 vs
    ~155.5 ms/step on the flagship A/B), rejected under the round-4 8 MB
    budget; the kernel stays exact vs the XLA twin."""
    n, t, c, heads, d = 16, 16, 1280, 20, 64
    monkeypatch.setenv("CAMC2V_TEMPORAL_MAX_WEIGHT_MB", "8")
    assert not ta.supported(n, t, c, c, heads, d)
    monkeypatch.setenv("CAMC2V_TEMPORAL_MAX_WEIGHT_MB", "14")
    assert ta.supported(n, t, c, c, heads, d)
    x, wq, wk, wv, wo, bo = _mk(n, t, c, heads, d, c)
    got = ta.fused_temporal_mha(x, wq, wk, wv, wo, bo, heads=heads)
    want = _xla_reference(x, wq, wk, wv, wo, bo, heads)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.06, rtol=0.05,
    )
