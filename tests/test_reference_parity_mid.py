"""Flagship-scale (mid-config) numerical parity gate — VERDICT round-2 #2.

The tiny gate (test_reference_parity.py) runs a 2-level UNet; the flagship's
highest-risk routing lives exactly where tiny can't see it:

  * 4-level channel_mult (1,2,4,4) ds bookkeeping and the log2-indexed plucker
    pyramid (reference model/modules/modified_forwards.py:64-124)
  * epipolar masks at 4 resolutions keyed by downsample factor
    (model/camcontexti2v.py:525-572)
  * num_res_blocks=2 input/output block indexing
  * register tokens (4) and the PLAIN (production) epipolar config — the
    in-kernel mask path (ops/epipolar_flash.py) dispatching at ds8

This gate builds the reference CamContextI2V at a mid config (IMG=128,
latent 16x16, T=16, model_channels=32, the flagship's level/block layout),
imports randomized weights into the JAX twin, and asserts:

  1. camera-condition parity: 4-level plucker pyramid + fundamental matrices +
     all 4 per-ds masks (bit-exact)
  2. apply_model parity with the reference's mask bits injected (routing gate)
  3. my plain-F payload (the production path: in-kernel masks at ds8,
     materialised plain masks below) == my masks payload (path equivalence,
     which composes with #2 into full production-path parity)

Determinism: the flagship sets add_small_perturbation_on_zero_T=True, which
draws torch.randn noise for zero-translation (same-frame) pairs — RNG that
cannot be mirrored across frameworks. Both sides are patched with the SAME
deterministic, well-conditioned offset (0.021, -0.013, 0.017): diagonal F
becomes a pure-translation fundamental matrix (every pixel sits exactly on its
own epipolar line, so no fully-masked rows) with healthy mask-bit margins —
unlike the 1e-6 noise, whose near-degenerate F makes diagonal bits FP-chaotic.

g>1 head-group layouts are not reachable at CPU-oracle scale (they need
heads > 8 at d=64); they are pinned numerically by
tests/test_epipolar_flash.py::test_kernel_head_groups, which composes with
this gate (kernel == masked-XLA == reference).
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.append(str(pathlib.Path(__file__).parent / "oracle"))

import torch  # noqa: E402

import refload  # noqa: E402
from refload import MID  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RTOL = 2e-4
ATOL = 5e-5

# fixed, well-conditioned stand-in translation for zero-T (same-frame) pairs
_OFFSET = np.array([0.021, -0.013, 0.017], np.float32).reshape(3, 1)


def _det_perturb_torch(t, epsilon=1e-6):
    zero = (t.abs() < epsilon).all(dim=-2, keepdim=True)
    off = torch.from_numpy(_OFFSET).to(t.dtype).expand(t.shape)
    return torch.where(zero, off, t)


def _det_perturb_jax(t, rng, epsilon=1e-6):
    zero = jnp.all(jnp.abs(t) < epsilon, axis=-2, keepdims=True)
    off = jnp.broadcast_to(jnp.asarray(_OFFSET), t.shape)
    return jnp.where(zero, off, t)


@pytest.fixture(scope="module")
def mid_pair():
    from camc2v_tpu.camera import geometry as G
    from camc2v_tpu.utils.torch_import import import_state_dict, map_reference_key

    ref = refload.build_ref_model("camcontext", dims=MID)
    mine = refload.my_model("camcontext", dims=MID)
    params = mine.init_params(jax.random.key(0), (MID.IMG, MID.IMG))

    rng = np.random.default_rng(7)
    sd = ref.state_dict()
    new_sd = {}
    for k, v in sd.items():
        arr = v.detach().cpu().numpy()
        if arr.dtype.kind == "f" and map_reference_key(k, mine.config.unet) is not None:
            arr = np.asarray(arr + rng.normal(0.0, 0.02, arr.shape), dtype=np.float32)
            new_sd[k] = torch.from_numpy(arr).reshape(v.shape)
        else:
            new_sd[k] = v
    ref.load_state_dict(new_sd)
    sd_np = {k: v.detach().cpu().numpy() for k, v in new_sd.items()}

    params, report = import_state_dict(sd_np, params, mine.config.unet)
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["unmatched_ckpt"], report["unmatched_ckpt"][:10]
    missing = [
        k for k in report["missing_params"]
        if not (k.startswith("clip_text/") or k.startswith("clip_vision/"))
    ]
    assert not missing, missing[:10]

    ref.get_first_stage_encoding = lambda post, noise=None: ref.scale_factor * post.mode()
    ref.add_small_perturbation = _det_perturb_torch
    refload.patch_my_encoders(mine)

    orig = G.add_small_perturbation
    G.add_small_perturbation = _det_perturb_jax
    yield ref, mine, params
    G.add_small_perturbation = orig


def _conds(ref, mine, params, b=1):
    batch = refload.make_batch(b=b, n_ctx=2, dims=MID)
    tbatch = refload.to_torch_batch(batch)
    jbatch = refload.to_jax_batch(batch)
    with torch.no_grad():
        z_ref, cond_ref, fs_ref = ref.get_batch_input(tbatch, random_uncond=False, return_fs=True)
    z_my, cond_my = mine.prepare_batch(params, jbatch, random_uncond=False)
    return (z_ref, cond_ref, fs_ref), (z_my, cond_my), (tbatch, jbatch)


def _tj(x):  # torch (b, c, t, h, w) -> numpy (b, t, h, w, c)
    return x.detach().cpu().numpy().transpose(0, 2, 3, 4, 1)


def test_camera_condition_parity_mid(mid_pair):
    """4-level plucker pyramid + all 4 per-ds masks, bit-exact."""
    from camc2v_tpu.camera import geometry as G

    ref, mine, params = mid_pair
    batch = refload.make_batch(b=1, n_ctx=2, dims=MID)
    tbatch = refload.to_torch_batch(batch)
    jbatch = refload.to_jax_batch(batch)

    x = tbatch["video"]
    cfi_t = torch.zeros(1, dtype=torch.long)
    with torch.no_grad():
        _, kw = ref.get_batch_input_camera_condition_process(tbatch, x, cfi_t, 1.0, False)
    cc_ref = kw["camera_condition"]

    cfi_j = jnp.zeros((1,), jnp.int32)
    cam_my = mine.camera_condition(params, jbatch, cfi_j, 1.0)

    feats = cc_ref["pluker_embedding_features"]
    assert len(feats) == len(cam_my["plucker"]) == 4, (len(feats), len(cam_my["plucker"]))
    for i, feat_ref in enumerate(feats):
        np.testing.assert_allclose(
            np.asarray(cam_my["plucker"][i]),
            feat_ref.detach().numpy().transpose(0, 2, 3, 4, 1),
            rtol=RTOL, atol=ATOL, err_msg=f"plucker level {i}",
        )

    # production plain path carries F, not masks — materialise mine for the
    # bit-exact comparison against the reference's sample_locs_dict
    assert "F" in cam_my and "masks" not in cam_my
    locs = cc_ref["sample_locs_dict"]
    assert sorted(locs.keys()) == [8, 16, 32, 64]
    my_masks = G.build_epipolar_masks(
        cam_my["F"], MID.T, (MID.LAT, MID.LAT), mine.config.epipolar
    )
    assert sorted(my_masks.keys()) == sorted(locs.keys())
    for d, mask_ref in locs.items():
        mine_np, ref_np = np.asarray(my_masks[d]), mask_ref.numpy()
        # pixels whose |dist - thresh| sits inside f32 rounding flip with op
        # order (measured: 2 bits of 16.7M at ds8) — bound the tail, don't
        # chase bit-exactness the reference itself doesn't have across devices
        frac = float((mine_np != ref_np).mean())
        assert frac < 1e-6, f"mask ds {d}: {frac:.2e} of bits differ"


def test_apply_model_parity_mid(mid_pair):
    """Full 4-level patched-forward parity; masks injected for bit-identity,
    then the plain-F production payload checked against the masks payload."""
    ref, mine, params = mid_pair
    (z_ref, cond_ref, fs_ref), (z_my, cond_my), _ = _conds(ref, mine, params)

    np.testing.assert_allclose(np.asarray(z_my), _tj(z_ref), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(cond_my["c_crossattn"]),
        cond_ref["c_crossattn"][0].detach().cpu().numpy(),
        rtol=RTOL, atol=ATOL,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 4, MID.T, MID.LAT, MID.LAT)).astype(np.float32)
    t_np = np.array([500], np.int64)
    fs = np.array([3], np.int64)

    with torch.no_grad():
        eps_ref = ref.apply_model(
            torch.from_numpy(x), torch.from_numpy(t_np), cond_ref, fs=torch.from_numpy(fs)
        )

    cc = cond_ref["camera_condition"]
    cam_masks = dict(cond_my["camera"])
    cam_masks.pop("F")
    cam_masks["masks"] = {d: jnp.asarray(m.numpy()) for d, m in cc["sample_locs_dict"].items()}
    cond_masks = dict(cond_my, camera=cam_masks)

    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    tj = jnp.asarray(t_np, jnp.int32)
    fsj = jnp.asarray(fs, jnp.int32)

    eps_my = mine.apply_model(params, xj, tj, cond_masks, fsj)
    ref_np = _tj(eps_ref)
    my_np = np.asarray(eps_my)
    scale = np.abs(ref_np).mean() + 1e-8
    assert np.max(np.abs(my_np - ref_np)) / scale < 5e-3, (
        f"apply_model drift: max|d|={np.max(np.abs(my_np - ref_np)):.3e} "
        f"mean|ref|={scale:.3e}"
    )
    np.testing.assert_allclose(my_np, ref_np, rtol=5e-3, atol=5e-4)

    # production plain-F payload (in-kernel masks at ds8, materialised plain
    # masks at ds16/32/64) must match the injected-masks forward
    eps_plain = mine.apply_model(params, xj, tj, cond_my, fsj)
    plain_np = np.asarray(eps_plain)
    assert np.max(np.abs(plain_np - my_np)) / scale < 2e-3, (
        f"plain-path drift vs masks payload: max|d|={np.max(np.abs(plain_np - my_np)):.3e}"
    )
