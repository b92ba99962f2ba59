"""Fused LN+GEGLU FF kernel: parity vs the XLA module path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from camc2v_tpu.ops import geglu_ff as gff


def _mk(rows, c, mult=4, seed=0):
    rng = np.random.default_rng(seed)
    inner = c * mult
    x = jnp.asarray(rng.normal(size=(rows, c)), jnp.bfloat16)
    ls = jnp.asarray(rng.normal(size=(c,)) * 0.2 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.normal(size=(c, 2 * inner)) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.normal(size=(2 * inner,)) * 0.1, jnp.float32)
    wf = jnp.asarray(rng.normal(size=(inner, c)) * 0.05, jnp.float32)
    bf = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    return x, ls, lb, wp, bp, wf, bf


def test_kernel_matches_module_path():
    """Kernel output == LayerNormF32 -> FeedForward -> residual (bf16 tol)."""
    from camc2v_tpu.nn.attention import FeedForward
    from camc2v_tpu.nn.layers import LayerNormF32

    rows, c = 256, 320
    x, ls, lb, wp, bp, wf, bf = _mk(rows, c)
    assert gff.supported(rows, c, 4 * c, c)
    got = gff.fused_ln_geglu_ff(x, ls, lb, wp, bp, wf, bf)
    assert got.shape == (rows, c) and got.dtype == x.dtype

    # module path with the same weights
    ln = LayerNormF32()
    ff = FeedForward(c, dtype=jnp.bfloat16)
    x3 = x[None]  # modules want (N, L, C)
    normed = ln.apply(
        {"params": {"LayerNorm_0": {"scale": ls, "bias": lb}}}, x3
    )
    ff_out = ff.apply(
        {"params": {"geglu": {"proj": {"kernel": wp, "bias": bp}},
                    "fc2": {"kernel": wf, "bias": bf}}},
        normed,
    )
    want = (ff_out + x3)[0]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.08, rtol=0.05,
    )


def test_vjp_finite_and_close():
    rows, c = 128, 128
    x, ls, lb, wp, bp, wf, bf = _mk(rows, c)

    def loss_fused(p):
        return jnp.sum(gff.fused_ln_geglu_ff(x, *p).astype(jnp.float32) ** 2)

    def loss_xla(p):
        ls_, lb_, wp_, bp_, wf_, bf_ = p
        out = gff._ff_xla(x, ls_, lb_, wp_, bp_, wf_, bf_, inner=wf_.shape[0], eps=1e-5)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    p = (ls, lb, wp, bp, wf, bf)
    gf = jax.grad(loss_fused)(p)
    gx = jax.grad(loss_xla)(p)
    for a, b, name in zip(gf, gx, ["ls", "lb", "wp", "bp", "wf", "bf"]):
        assert bool(jnp.all(jnp.isfinite(a))), name
        denom = np.abs(np.asarray(b)).max() + 1e-6
        rel = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max() / denom
        assert rel < 0.05, (name, rel)


def test_block_dispatch_param_tree():
    """BasicTransformerBlock with fused FF on vs off: identical params, close outputs."""
    from camc2v_tpu.nn.attention import BasicTransformerBlock

    n, t, c = 16, 16, 256
    x = jnp.asarray(np.random.default_rng(3).normal(size=(n, t, c)), jnp.bfloat16)
    mod = BasicTransformerBlock(dim=c, n_heads=4, d_head=64, dtype=jnp.bfloat16)

    gff.use_fused(True)
    try:
        params_fused = mod.init(jax.random.key(0), x)
        out_fused = mod.apply(params_fused, x)
    finally:
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
        atol=0.08, rtol=0.05,
    )


def test_supported_gates():
    assert gff.supported(32768, 320, 1280, 320)
    assert gff.supported(256, 512, 2048, 512)
    assert not gff.supported(100, 320, 1280, 320)    # rows not tileable
    assert not gff.supported(256, 640, 2560, 640)    # weights exceed VMEM budget
    assert not gff.supported(256, 96, 384, 96)       # channels too small


def test_big_weight_budget_c640(monkeypatch):
    """C=640 FF (9.8 MB resident weights) is rejected at the default budget
    and admitted (exactly) at CAMC2V_FF_MAX_WEIGHT_MB=12 — the TPU A/B that
    would route the ds16 FF sites through the kernel."""
    rows, c = 256, 640
    assert not gff.supported(rows, c, 4 * c, c)
    monkeypatch.setenv("CAMC2V_FF_MAX_WEIGHT_MB", "12")
    assert gff.supported(rows, c, 4 * c, c)
    x, ls, lb, wp, bp, wf, bf = _mk(rows, c, seed=2)
    got = gff.fused_ln_geglu_ff(x, ls, lb, wp, bp, wf, bf)
    want = gff._ff_xla(x, ls, lb, wp, bp, wf, bf, inner=4 * c, eps=1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.08, rtol=0.05,
    )
