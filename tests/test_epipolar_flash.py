"""Epipolar flash-attention v2 (in-kernel mask) correctness tests.

The kernel must reproduce the materialised-mask path bit-for-bit (up to f32
accumulation): same geometry -> same mask -> same attention output, plus the
exactly-safe tile-skip property (a skipped tile is provably empty).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camc2v_tpu.camera import geometry as G
from camc2v_tpu.nn.epipolar import Epipolar, EpipolarConfig, plain_epipolar
from camc2v_tpu.ops.epipolar_flash import (
    epipolar_flash_attention,
    epipolar_lines,
    epipolar_tile_map,
    materialize_mask,
)
from camc2v_tpu.ops.flash_attention import flash_attention

B, T, H, W, DS, R = 1, 4, 8, 8, 8, 4
HW = H * W
LQ = T * HW
BQ = BK = 64  # small tiles so the tiny geometry tiles cleanly


def _realistic_F(b=B, t=T, seed=0):
    """F matrices from an actual camera trajectory (not random noise)."""
    rng = np.random.default_rng(seed)
    K = np.array([[H * DS, 0, H * DS / 2], [0, W * DS, W * DS / 2], [0, 0, 1]], np.float32)
    c2w = np.tile(np.eye(4, dtype=np.float32), (b, t, 1, 1))
    for i in range(t):
        c2w[:, i, 0, 3] = 0.4 * i + 0.05
        c2w[:, i, 1, 3] = 0.1 * i
        c2w[:, i, 2, 3] = -0.15 * i
    pairs = G.relative_c2w_pairs(jnp.asarray(c2w))
    Rm, tv = pairs[..., :3, :3], pairs[..., :3, 3:4]
    tv = G.add_small_perturbation(tv, jax.random.key(1))
    return G.fundamental_matrix(jnp.broadcast_to(jnp.asarray(K), (b, t, t, 3, 3)), Rm, tv)


def _qkv(seed=0, heads=2, d=64):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, LQ, heads, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(B, LQ, heads, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(B, LQ, heads, d)), jnp.float32)
    kreg = jnp.asarray(rng.normal(size=(B, R, heads, d)), jnp.float32)
    vreg = jnp.asarray(rng.normal(size=(B, R, heads, d)), jnp.float32)
    pad = BK - R
    k = jnp.concatenate([kf, kreg, jnp.zeros((B, pad, heads, d))], axis=1)
    v = jnp.concatenate([vf, vreg, jnp.zeros((B, pad, heads, d))], axis=1)
    return q, k, v, kreg, vreg, kf, vf


def test_lines_match_reference_mask_build():
    """materialize_mask(lines) == geometry.epipolar_mask (plain config)."""
    F = _realistic_F()
    lines = epipolar_lines(F, H, W, DS)
    mask_v2 = materialize_mask(lines, T, H, W, DS)
    mask_ref = G.epipolar_mask(F, T, H, W, DS, EpipolarConfig(origin_h=H * DS, origin_w=W * DS))
    np.testing.assert_array_equal(np.asarray(mask_v2), np.asarray(mask_ref))


def test_kernel_matches_materialized_path():
    F = _realistic_F()
    lines = epipolar_lines(F, H, W, DS)
    q, k, v, *_ = _qkv()
    out2 = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R, block_q=BQ, block_k=BK
    )
    mask = materialize_mask(lines, T, H, W, DS)
    regmask = jnp.broadcast_to((jnp.arange(BK) < R)[None, None], (B, LQ, BK))
    out1 = flash_attention(q, k, v, mask=jnp.concatenate([mask, regmask], axis=-1))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=2e-6)


def test_tile_skip_is_exactly_safe():
    """A tile marked empty by the hull bound must be empty in the dense mask."""
    for seed in range(3):
        F = _realistic_F(seed=seed)
        lines = epipolar_lines(F, H, W, DS)
        tm = np.asarray(epipolar_tile_map(lines, T, H, W, DS, BQ, BK))
        mask = np.asarray(materialize_mask(lines, T, H, W, DS))
        dense_any = mask.reshape(B, LQ // BQ, BQ, LQ // BK, BK).any(axis=(2, 4))
        violations = (~tm[..., :-1].astype(bool)) & dense_any
        assert violations.sum() == 0
        assert tm[..., -1].all()  # register tile always visible


def test_zero_F_diagonal_all_masked_rows():
    """F == 0 pairs (zero translation, no perturbation) -> NaN lines -> empty
    mask rows -> kernel emits zeros for those queries (matches the v1 kernel's
    fully-masked-row guard)."""
    F = _realistic_F()
    eye = np.eye(T, dtype=bool)
    F = jnp.where(jnp.asarray(eye)[None, :, :, None, None], 0.0, F)
    lines = epipolar_lines(F, H, W, DS)
    q, k, v, *_ = _qkv()
    out2 = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R, block_q=BQ, block_k=BK
    )
    assert np.isfinite(np.asarray(out2)).all()
    mask = materialize_mask(lines, T, H, W, DS)
    # diagonal blocks are all-False
    mb = np.asarray(mask).reshape(B, T, HW, T, HW)
    assert not mb[:, np.arange(T), :, np.arange(T), :].any()


def test_epipolar_module_F_path_matches_mask_path():
    """Full Epipolar module: F payload (v2) == masks payload (v1), same params."""
    cfg = EpipolarConfig(
        origin_h=H * DS, origin_w=W * DS, attention_resolution=(1,), num_register_tokens=R
    )
    assert plain_epipolar(cfg)
    F = _realistic_F()
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.normal(size=(B, T, H, W, 128)), jnp.float32)
    module = Epipolar(config=cfg, query_dim=128, heads=2)

    masks = G.build_epipolar_masks(F, T, (H, W), cfg)
    from util import perturb_zero_kernels

    # the zero-init output projection would make this comparison vacuous
    params = perturb_zero_kernels(module.init(jax.random.key(0), feats, masks=masks), jax.random.key(7))
    out_mask = module.apply(params, feats, masks=masks)
    out_F = module.apply(params, feats, F=F)
    assert float(np.asarray(out_mask).std()) > 1e-4
    np.testing.assert_allclose(np.asarray(out_F), np.asarray(out_mask), atol=2e-5)


def test_precomputed_penalties_match_in_kernel():
    """penalties= path (streamed bf16 mask tiles) == in-kernel line-distance
    path, bit-for-bit: same mask band, same register handling, same softmax."""
    from camc2v_tpu.ops.epipolar_flash import materialize_penalties

    F = _realistic_F()
    lines = epipolar_lines(F, H, W, DS)
    q, k, v, *_ = _qkv()
    out_inkernel = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=BK,
    )
    # f32 penalties on CPU keep the comparison exact; bf16 holds 0/-1e30
    # exactly so the dtype only affects the (zero/NEG_INF) storage format
    pen = materialize_penalties(lines, T, H, W, DS, R, BK, dtype=jnp.float32)
    assert pen.shape == (B, LQ, LQ + BK)
    out_pre = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=BK, penalties=pen,
    )
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_inkernel), atol=2e-6)
    out_bf16 = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=BK, penalties=pen.astype(jnp.bfloat16),
    )
    np.testing.assert_allclose(np.asarray(out_bf16), np.asarray(out_inkernel), atol=2e-6)


def test_precomputed_penalties_multi_frame_tiles():
    """penalties path through the whole-frames-per-tile branch (ds16 layout)."""
    from camc2v_tpu.ops.epipolar_flash import materialize_penalties

    F = _realistic_F()
    lines = epipolar_lines(F, H, W, DS)
    q, k0, v0, *_ = _qkv()
    bk = 4 * HW
    pad = bk - BK
    k = jnp.concatenate([k0, jnp.zeros((B, pad, *k0.shape[2:]))], axis=1)
    v = jnp.concatenate([v0, jnp.zeros((B, pad, *v0.shape[2:]))], axis=1)
    pen = materialize_penalties(lines, T, H, W, DS, R, bk, dtype=jnp.float32)
    out_pre = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=bk, penalties=pen,
    )
    out_inkernel = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=bk,
    )
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_inkernel), atol=2e-6)


def test_add_precomputed_penalties_prep():
    """Sampler prep augmentation: env gate, size cap, and module parity.

    Uses a 16x16 feature grid (hw = 256) so the REAL tile sizes clear the
    kernel_ok minimum and the Pallas path (interpret mode on CPU) actually
    consumes the penalties.
    """
    import os

    from camc2v_tpu.nn.epipolar import add_precomputed_penalties, prepare_plain_epipolar

    H2 = W2 = 16
    cfg = EpipolarConfig(
        origin_h=H2 * DS, origin_w=W2 * DS, attention_resolution=(1,), num_register_tokens=R
    )
    F = _realistic_F()
    prep = prepare_plain_epipolar(F, cfg)
    assert "tile_any" in prep[DS]
    try:
        os.environ["CAMC2V_EPI_PRECOMP"] = "1"
        aug = add_precomputed_penalties(prep, cfg, T)
        assert "penalties" in aug[DS]
        assert aug[DS]["penalties"].dtype == jnp.bfloat16
        # size cap: a 1-byte budget keeps the in-kernel path
        capped = add_precomputed_penalties(prep, cfg, T, max_level_bytes=1)
        assert "penalties" not in capped[DS]
        os.environ["CAMC2V_EPI_PRECOMP"] = "0"
        off = add_precomputed_penalties(prep, cfg, T)
        assert "penalties" not in off[DS]

        # full module: augmented prep == in-kernel prep
        os.environ["CAMC2V_EPI_PRECOMP"] = "1"
        rng = np.random.default_rng(7)
        feats = jnp.asarray(rng.normal(size=(B, T, H2, W2, 128)), jnp.float32)
        module = Epipolar(config=cfg, query_dim=128, heads=2)
        from util import perturb_zero_kernels

        params = perturb_zero_kernels(module.init(jax.random.key(0), feats, F=F, prep=prep), jax.random.key(7))
        out_plain = module.apply(params, feats, F=F, prep=prep)
        out_aug = module.apply(params, feats, F=F, prep=aug)
        assert float(np.asarray(out_plain).std()) > 1e-4  # non-vacuous
        np.testing.assert_allclose(np.asarray(out_aug), np.asarray(out_plain), atol=2e-6)
    finally:
        os.environ.pop("CAMC2V_EPI_PRECOMP", None)


def test_kv_resident_matches_streaming():
    """CAMC2V_EPI_KV_RESIDENT=1 (whole-k/v-in-VMEM, constant block index)
    must be numerically identical to the streaming kernel, in both the
    per-frame-tile and whole-frames-per-tile branches."""
    import os

    F = _realistic_F()
    lines = epipolar_lines(F, H, W, DS)
    q, k, v, *_ = _qkv()
    os.environ["CAMC2V_EPI_KV_RESIDENT"] = "0"  # streaming baseline (default flipped to resident in r4)
    base = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=BK,
    )
    try:
        os.environ["CAMC2V_EPI_KV_RESIDENT"] = "1"
        res = epipolar_flash_attention(
            q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
            block_q=BQ, block_k=BK,
        )
        np.testing.assert_allclose(np.asarray(res), np.asarray(base), atol=2e-6)

        # whole-frames-per-tile branch
        q2, k0, v0, *_ = _qkv(seed=3)
        bk = 4 * HW
        pad = bk - BK
        k2 = jnp.concatenate([k0, jnp.zeros((B, pad, *k0.shape[2:]))], axis=1)
        v2 = jnp.concatenate([v0, jnp.zeros((B, pad, *v0.shape[2:]))], axis=1)
        res2 = epipolar_flash_attention(
            q2, k2, v2, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
            block_q=BQ, block_k=bk,
        )
        os.environ["CAMC2V_EPI_KV_RESIDENT"] = "0"  # pin streaming (default flipped to resident in r4)
        base2 = epipolar_flash_attention(
            q2, k2, v2, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
            block_q=BQ, block_k=bk,
        )
        np.testing.assert_allclose(np.asarray(res2), np.asarray(base2), atol=2e-6)
    finally:
        os.environ.pop("CAMC2V_EPI_KV_RESIDENT", None)


def test_gradients_flow_through_v2():
    F = _realistic_F()
    lines = epipolar_lines(F, H, W, DS)
    q, k, v, *_ = _qkv()

    def loss(q, k, v):
        out = epipolar_flash_attention(
            q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
            block_q=BQ, block_k=BK,
        )
        return jnp.sum(out**2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert np.isfinite(float(val))
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        assert float(jnp.abs(gr).max()) > 0


class TestGroupNormFused:
    """ops/groupnorm.py vs flax nn.GroupNorm reference numerics."""

    def test_matches_flax_groupnorm(self):
        import flax.linen as nn

        from camc2v_tpu.ops.groupnorm import group_norm_fused, group_norm_plain

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 16, 16, 128)), jnp.float32) * 3 + 1
        scale = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(128,)), jnp.float32)

        gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
        ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)

        for fn in (group_norm_plain, group_norm_fused):
            out = fn(x, scale, bias, num_groups=32)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        out_silu = group_norm_fused(x, scale, bias, num_groups=32, silu=True)
        np.testing.assert_allclose(
            np.asarray(out_silu), np.asarray(ref) * jax.nn.sigmoid(np.asarray(ref)), atol=2e-5
        )

    def test_bf16_input_f32_stats(self):
        from camc2v_tpu.ops.groupnorm import group_norm_fused

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.bfloat16)
        scale = jnp.ones((128,), jnp.float32)
        bias = jnp.zeros((128,), jnp.float32)
        out = group_norm_fused(x, scale, bias, num_groups=32)
        assert out.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_gradients(self):
        from camc2v_tpu.ops.groupnorm import group_norm_fused, group_norm_plain

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.float32)
        scale = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(128,)), jnp.float32)

        g_fused = jax.grad(lambda *a: jnp.sum(group_norm_fused(*a, num_groups=32, silu=True) ** 2), argnums=(0, 1, 2))(x, scale, bias)
        g_plain = jax.grad(lambda *a: jnp.sum(group_norm_plain(*a, num_groups=32, silu=True) ** 2), argnums=(0, 1, 2))(x, scale, bias)
        for gf, gp in zip(g_fused, g_plain):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gp), atol=1e-4)

    def test_groupnorm32_module_param_paths_unchanged(self):
        from camc2v_tpu.nn.layers import GroupNorm32

        m = GroupNorm32()
        p = m.init(jax.random.key(0), jnp.zeros((1, 4, 4, 64)))
        flat = jax.tree_util.tree_flatten_with_path(p["params"])[0]
        paths = {"/".join(str(k.key) for k in path) for path, _ in flat}
        assert paths == {"GroupNorm_0/scale", "GroupNorm_0/bias"}


def test_kernel_multi_frame_tiles():
    """block_k > hw: one k-tile spans several whole frames (the ds16 flagship
    layout after the BK=1024 generalisation)."""
    F = _realistic_F()
    lines = epipolar_lines(F, H, W, DS)
    q, k0, v0, *_ = _qkv()
    bk = 4 * HW  # all 4 frames in one tile
    pad = bk - BK
    k = jnp.concatenate([k0, jnp.zeros((B, pad, *k0.shape[2:]))], axis=1)
    v = jnp.concatenate([v0, jnp.zeros((B, pad, *v0.shape[2:]))], axis=1)
    out2 = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=bk,
    )
    mask = materialize_mask(lines, T, H, W, DS)
    regmask = jnp.broadcast_to((jnp.arange(bk) < R)[None, None], (B, LQ, bk))
    out1 = flash_attention(q, k, v, mask=jnp.concatenate([mask, regmask], axis=-1))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=2e-6)


def test_big_input_two_phase_kernel():
    """(B, T, H, W, C) temporal-norm layout through the streaming kernel."""
    import flax.linen as nn

    from camc2v_tpu.ops.groupnorm import group_norm_fused_big, group_norm_big_supported

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 128)) * 2 + 0.7, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    assert group_norm_big_supported(x, 32)

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    out = group_norm_fused_big(x, scale, bias, num_groups=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

    out_s = group_norm_fused_big(x, scale, bias, num_groups=32, silu=True)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(ref) * jax.nn.sigmoid(np.asarray(ref)), atol=5e-5
    )
    g = jax.grad(lambda a: jnp.sum(group_norm_fused_big(a, scale, bias, num_groups=32) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_temporal_two_kernel_groupnorm():
    """(B, T, H, W, C) temporal norms via the split moments+apply kernel pair."""
    import flax.linen as nn

    from camc2v_tpu.ops.groupnorm import (
        group_norm_fused_temporal,
        group_norm_temporal_supported,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 128)) * 2 + 0.7, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    assert group_norm_temporal_supported(x, 32)

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    out = group_norm_fused_temporal(x, scale, bias, num_groups=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)

    out_s = group_norm_fused_temporal(x, scale, bias, num_groups=32, silu=True)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(ref) * jax.nn.sigmoid(np.asarray(ref)), atol=5e-4
    )
    # bf16 input path + gradient through the plain-twin VJP
    out_b = group_norm_fused_temporal(x.astype(jnp.bfloat16), scale, bias, num_groups=32)
    np.testing.assert_allclose(
        np.asarray(out_b, np.float32), np.asarray(ref), atol=0.05, rtol=0.05
    )
    g = jax.grad(
        lambda a: jnp.sum(group_norm_fused_temporal(a, scale, bias, num_groups=32) ** 2)
    )(x)
    g_ref = jax.grad(
        lambda a: jnp.sum(gn.apply({"params": {"scale": scale, "bias": bias}}, a) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-3)


def test_fused_layer_norm():
    """Row-parallel LN kernel vs flax LayerNorm, fwd + grad, f32 and bf16."""
    import flax.linen as nn

    from camc2v_tpu.ops.layernorm import (
        layer_norm_fused, layer_norm_plain, layer_norm_supported,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(32, 48, 320)) * 1.5 + 0.3, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(320,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(320,)), jnp.float32)
    assert layer_norm_supported(x)

    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
    ref = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    for fn in (layer_norm_plain, layer_norm_fused):
        np.testing.assert_allclose(
            np.asarray(fn(x, scale, bias, eps=1e-5)), np.asarray(ref), atol=1e-4
        )

    out_b = layer_norm_fused(x.astype(jnp.bfloat16), scale, bias, eps=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_b, np.float32), np.asarray(ref), atol=0.08, rtol=0.05
    )

    g = jax.grad(lambda a: jnp.sum(layer_norm_fused(a, scale, bias) ** 2))(x)
    g_ref = jax.grad(
        lambda a: jnp.sum(ln.apply({"params": {"scale": scale, "bias": bias}}, a) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-3)

    # odd-but-supported channel counts and row tiles
    x2 = jnp.asarray(rng.normal(size=(8, 1024)), jnp.float32)
    assert layer_norm_supported(x2)
    np.testing.assert_allclose(
        np.asarray(layer_norm_fused(x2, jnp.ones((1024,)), jnp.zeros((1024,)))),
        np.asarray(layer_norm_plain(x2, jnp.ones((1024,)), jnp.zeros((1024,)))),
        atol=1e-4,
    )


def test_kernel_head_groups():
    """heads=10 -> hb=5, g=2: the heads-major output path (g>1)."""
    F = _realistic_F()
    lines = epipolar_lines(F, H, W, DS)
    rng = np.random.default_rng(9)
    heads, d = 10, 64
    q = jnp.asarray(rng.normal(size=(B, LQ, heads, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, LQ + BK, heads, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, LQ + BK, heads, d)), jnp.float32)
    out2 = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=BK,
    )
    mask = materialize_mask(lines, T, H, W, DS)
    regmask = jnp.broadcast_to((jnp.arange(BK) < R)[None, None], (B, LQ, BK))
    out1 = flash_attention(q, k, v, mask=jnp.concatenate([mask, regmask], axis=-1))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=2e-6)


def test_chunked_4d_groupnorm_view():
    """(N, H, W, C) viewed as (N, s, H/s*W, C) through the temporal kernel
    pair gives per-sample full-map stats (the VAE 256^2 dispatch)."""
    import flax.linen as nn

    from camc2v_tpu.ops.groupnorm import (
        group_norm_fused_temporal, group_norm_temporal_supported,
    )

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 16, 8, 128)) * 1.3 - 0.2, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(128,)), jnp.float32)

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    xv = x.reshape(2, 4, 4 * 8, 128)
    assert group_norm_temporal_supported(xv, 32)
    out = group_norm_fused_temporal(xv, scale, bias, num_groups=32, eps=1e-6).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)

def test_kv_resident_composes_with_penalties():
    """KV_RESIDENT=1 + penalties= (the composed sampler mode) must match the
    plain in-kernel path, in both tile-layout branches."""
    import os

    from camc2v_tpu.ops.epipolar_flash import materialize_penalties

    F = _realistic_F()
    lines = epipolar_lines(F, H, W, DS)
    q, k, v, *_ = _qkv()
    os.environ["CAMC2V_EPI_KV_RESIDENT"] = "0"  # streaming baseline (default flipped to resident in r4)
    base = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=BK,
    )
    pen = materialize_penalties(lines, T, H, W, DS, R, BK, dtype=jnp.float32)
    try:
        os.environ["CAMC2V_EPI_KV_RESIDENT"] = "1"
        res = epipolar_flash_attention(
            q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
            block_q=BQ, block_k=BK, penalties=pen,
        )
        np.testing.assert_allclose(np.asarray(res), np.asarray(base), atol=2e-6)

        # whole-frames-per-tile branch
        bk = 4 * HW
        pad = bk - BK
        k2 = jnp.concatenate([k, jnp.zeros((B, pad, *k.shape[2:]))], axis=1)
        v2 = jnp.concatenate([v, jnp.zeros((B, pad, *v.shape[2:]))], axis=1)
        pen2 = materialize_penalties(lines, T, H, W, DS, R, bk, dtype=jnp.float32)
        res2 = epipolar_flash_attention(
            q, k2, v2, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
            block_q=BQ, block_k=bk, penalties=pen2,
        )
        os.environ["CAMC2V_EPI_KV_RESIDENT"] = "0"  # pin streaming (default flipped to resident in r4)
        base2 = epipolar_flash_attention(
            q, k2, v2, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
            block_q=BQ, block_k=bk,
        )
        np.testing.assert_allclose(np.asarray(res2), np.asarray(base2), atol=2e-6)
    finally:
        os.environ.pop("CAMC2V_EPI_KV_RESIDENT", None)

def test_batch_shared_penalties_match_per_batch():
    """A (1, Lq, Lk) penalty array shared across a fused-CFG-style batch of 2
    (identical geometry) must equal the per-batch duplicated form."""
    from camc2v_tpu.ops.epipolar_flash import materialize_penalties

    F = _realistic_F()
    lines1 = epipolar_lines(F, H, W, DS)      # (1, Lq, T, 3)
    lines2 = jnp.concatenate([lines1, lines1], axis=0)
    q1, k1, v1, *_ = _qkv()
    q = jnp.concatenate([q1, q1 * 0.5], axis=0)  # distinct features, same geometry
    k = jnp.concatenate([k1, k1 + 0.1], axis=0)
    v = jnp.concatenate([v1, v1 - 0.2], axis=0)
    pen1 = materialize_penalties(lines1, T, H, W, DS, R, BK, dtype=jnp.float32)
    pen2 = jnp.concatenate([pen1, pen1], axis=0)
    out_shared = epipolar_flash_attention(
        q, k, v, lines2, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=BK, penalties=pen1,
    )
    out_full = epipolar_flash_attention(
        q, k, v, lines2, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=BK, penalties=pen2,
    )
    np.testing.assert_allclose(np.asarray(out_shared), np.asarray(out_full), atol=2e-6)
    # and both equal the in-kernel path
    out_inkernel = epipolar_flash_attention(
        q, k, v, lines2, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=BK,
    )
    np.testing.assert_allclose(np.asarray(out_shared), np.asarray(out_inkernel), atol=2e-6)

def test_kv_resident_head_grouped_budget():
    """When full-heads resident k/v exceeds the VMEM budget (flagship ds8),
    residency must fall back to smaller head groups, not silently disable —
    forced here with a tiny budget so heads=2 runs as two g=1 groups."""
    import os

    F = _realistic_F()
    lines = epipolar_lines(F, H, W, DS)
    q, k, v, *_ = _qkv()
    os.environ["CAMC2V_EPI_KV_RESIDENT"] = "0"  # streaming baseline (default flipped to resident in r4)
    base = epipolar_flash_attention(
        q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
        block_q=BQ, block_k=BK,
    )
    try:
        os.environ["CAMC2V_EPI_KV_RESIDENT"] = "1"
        # 0.25 MB fits one head's k+v (160 KB) but not two (320 KB) at the
        # tiny test shapes, forcing the grouped-resident path (hb=1, g=2)
        os.environ["CAMC2V_EPI_RESIDENT_VMEM_MB"] = "0.25"
        res = epipolar_flash_attention(
            q, k, v, lines, t=T, h=H, w=W, downsample=DS, num_registers=R,
            block_q=BQ, block_k=BK,
        )
        np.testing.assert_allclose(np.asarray(res), np.asarray(base), atol=2e-6)
    finally:
        os.environ.pop("CAMC2V_EPI_KV_RESIDENT", None)
        os.environ.pop("CAMC2V_EPI_RESIDENT_VMEM_MB", None)


def test_pallas_backward_matches_xla_recompute():
    """CAMC2V_EPI_PALLAS_BWD=1 (flash-style dq/dk+dv kernels, in-kernel mask
    recompute from epipolar lines) must match the default XLA chunked-
    recompute VJP on both tile-layout branches (round 4: the XLA backward is
    ~200-250 ms of the 580 ms flagship train call)."""
    import os

    F = _realistic_F()
    lines = epipolar_lines(F, H, W, DS)

    def loss_fn(bk):
        def loss(q, k, v):
            out = epipolar_flash_attention(
                q, k, v, lines, t=T, h=H, w=W, downsample=DS,
                num_registers=R, block_q=BQ, block_k=bk,
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return loss

    try:
        for seed, bk_mul in ((0, 1), (3, 4)):
            q, k, v, *_ = _qkv(seed=seed)
            bk = BK if bk_mul == 1 else bk_mul * HW
            if bk != BK:
                pad = bk - BK
                k = jnp.concatenate([k, jnp.zeros((B, pad, *k.shape[2:]))], axis=1)
                v = jnp.concatenate([v, jnp.zeros((B, pad, *v.shape[2:]))], axis=1)
            os.environ["CAMC2V_EPI_PALLAS_BWD"] = "0"  # XLA recompute side (default flipped r4)
            g0 = jax.grad(loss_fn(bk), argnums=(0, 1, 2))(q, k, v)
            os.environ["CAMC2V_EPI_PALLAS_BWD"] = "1"
            g1 = jax.grad(loss_fn(bk), argnums=(0, 1, 2))(q, k, v)
            for a, b in zip(g0, g1):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b, np.float32),
                    rtol=5e-4, atol=5e-5,
                )
    finally:
        os.environ.pop("CAMC2V_EPI_PALLAS_BWD", None)
