"""Whole-model numerical parity gate against the reference implementation.

The reference PyTorch models (all 5 families) are instantiated at a tiny
config from /root/reference source (via tests/oracle/), their state_dicts are
randomised (so zero-init branches become active), loaded back into the torch
model AND imported into this repo's JAX models through
utils/torch_import.py::import_state_dict. Then we assert end-to-end agreement
of:

  * the camera-condition process (Plücker pyramid + epipolar masks + RT)
    — reference model/base.py:112-198, camcontexti2v.py:525-572
  * get_batch_input (z, c_concat, c_crossattn) with deterministic dummy CLIP
    encoders on both sides — reference camcontexti2v.py:280-491
  * apply_model (the full patched UNet forward) — reference
    modified_forwards.py:29-131, openaimodel3d.py:281-624
  * one deterministic DDIM step — reference samplers/ddim.py:240-346

Deliberate deviations (documented, not drift):
  * VAE encode uses the posterior MODE on both sides (the reference samples;
    the torch instance is patched here for determinism).
  * epipolar_config.add_small_perturbation_on_zero_T=False — the reference
    perturbs zero-translation pairs with torch.randn (RNG-incomparable);
    zero-T pairs instead take the deterministic NaN->False->hybrid-fallback
    path on both sides.
  * CLIP towers are replaced by identical deterministic dummies on both sides
    (CLIP parity is covered per-layer in test_torch_parity.py).
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.append(str(pathlib.Path(__file__).parent / "oracle"))

import torch  # noqa: E402

import refload  # noqa: E402
from refload import IMG, LAT, T  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FAMILIES = ["dynamicrafter", "motionctrl", "cameractrl", "cami2v", "camcontext"]

RTOL = 2e-4
ATOL = 5e-5


def _randomize_state_dict(ref_model, unet_cfg, seed=7):
    """Perturb every importable weight so zero-init branches become active.

    Schedule buffers and other non-imported keys are left untouched.
    """
    from camc2v_tpu.utils.torch_import import map_reference_key

    rng = np.random.default_rng(seed)
    sd = ref_model.state_dict()
    new_sd = {}
    for k, v in sd.items():
        arr = v.detach().cpu().numpy()
        if arr.dtype.kind == "f" and map_reference_key(k, unet_cfg) is not None:
            arr = np.asarray(arr + rng.normal(0.0, 0.02, arr.shape), dtype=np.float32)
            new_sd[k] = torch.from_numpy(arr).reshape(v.shape)
        else:
            new_sd[k] = v
    ref_model.load_state_dict(new_sd)
    return {k: v.detach().cpu().numpy() for k, v in new_sd.items()}


@pytest.fixture(scope="module")
def pairs():
    """family -> (ref torch model, my model, my params) with shared weights."""
    cache = {}

    def get(family):
        if family not in cache:
            ref = refload.build_ref_model(family)
            mine = refload.my_model(family)
            params = mine.init_params(jax.random.key(0), (IMG, IMG))
            sd = _randomize_state_dict(ref, mine.config.unet)
            from camc2v_tpu.utils.torch_import import import_state_dict

            params, report = import_state_dict(sd, params, mine.config.unet)
            assert not report["shape_mismatch"], report["shape_mismatch"][:5]
            assert not report["unmatched_ckpt"], report["unmatched_ckpt"][:10]
            missing = [
                k for k in report["missing_params"]
                if not (k.startswith("clip_text/") or k.startswith("clip_vision/"))
            ]
            assert not missing, missing[:10]
            # deterministic VAE encode on the torch side (see module docstring)
            ref.get_first_stage_encoding = (
                lambda post, noise=None: ref.scale_factor * post.mode()
            )
            refload.patch_my_encoders(mine)
            cache[family] = (ref, mine, params)
        return cache[family]

    return get


def _n_ctx(family):
    return 2 if family == "camcontext" else 0


def _both_conds(ref, mine, params, family, b=2):
    batch = refload.make_batch(b=b, n_ctx=_n_ctx(family))
    tbatch = refload.to_torch_batch(batch)
    jbatch = refload.to_jax_batch(batch)
    with torch.no_grad():
        z_ref, cond_ref, fs_ref = ref.get_batch_input(tbatch, random_uncond=False, return_fs=True)
    z_my, cond_my = mine.prepare_batch(params, jbatch, random_uncond=False)
    # Diagonal mask blocks are FP-chaotic on both sides (see
    # test_camera_condition_parity) — use the reference's bits verbatim so the
    # UNet forward comparison is apples-to-apples.
    cc = cond_ref.get("camera_condition")
    if cc is not None and cc.get("sample_locs_dict") and "masks" in cond_my.get("camera", {}):
        cond_my = dict(cond_my)
        cond_my["camera"] = dict(cond_my["camera"])
        cond_my["camera"]["masks"] = {
            d: jnp.asarray(m.numpy()) for d, m in cc["sample_locs_dict"].items()
        }
    return (z_ref, cond_ref, fs_ref), (z_my, cond_my), jbatch


def _tj(x):  # torch (b, c, t, h, w) -> numpy (b, t, h, w, c)
    return x.detach().cpu().numpy().transpose(0, 2, 3, 4, 1)


@pytest.mark.parametrize("family", FAMILIES)
def test_get_batch_input_parity(pairs, family):
    ref, mine, params = pairs(family)
    (z_ref, cond_ref, fs_ref), (z_my, cond_my), _ = _both_conds(ref, mine, params, family)

    np.testing.assert_allclose(np.asarray(z_my), _tj(z_ref), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(cond_my["c_concat"]), _tj(cond_ref["c_concat"][0]), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(cond_my["c_crossattn"]),
        cond_ref["c_crossattn"][0].detach().cpu().numpy(),
        rtol=RTOL,
        atol=ATOL,
    )


@pytest.mark.parametrize("family", ["motionctrl", "cameractrl", "cami2v", "camcontext"])
def test_camera_condition_parity(pairs, family):
    ref, mine, params = pairs(family)
    batch = refload.make_batch(b=2, n_ctx=_n_ctx(family))
    tbatch = refload.to_torch_batch(batch)
    jbatch = refload.to_jax_batch(batch)

    x = tbatch["video"]
    cfi_t = torch.zeros(2, dtype=torch.long)
    with torch.no_grad():
        _, kw = ref.get_batch_input_camera_condition_process(tbatch, x, cfi_t, 1.0, False)
    cc_ref = kw["camera_condition"]

    cfi_j = jnp.zeros((2,), jnp.int32)
    cam_my = mine.camera_condition(params, jbatch, cfi_j, 1.0)

    if family == "motionctrl":
        np.testing.assert_allclose(
            np.asarray(cam_my["RT"]), cc_ref["RT"].numpy(), rtol=1e-5, atol=1e-6
        )
        return

    for i, feat_ref in enumerate(cc_ref["pluker_embedding_features"]):
        np.testing.assert_allclose(
            np.asarray(cam_my["plucker"][i]),
            feat_ref.detach().numpy().transpose(0, 2, 3, 4, 1),
            rtol=RTOL,
            atol=ATOL,
            err_msg=f"plucker level {i}",
        )

    if family in ("cami2v", "camcontext"):
        locs = cc_ref["sample_locs_dict"]
        assert set(cam_my["masks"].keys()) == set(locs.keys())
        for d, mask_ref in locs.items():
            mine_m = np.asarray(cam_my["masks"][d])
            ref_m = mask_ref.numpy()
            # Diagonal (frame i <-> frame i) blocks have exactly-zero relative
            # translation: F == 0 up to rounding, the point-to-line distance is
            # 0/0, and the resulting bits are FP-chaotic (the reference even
            # randomises them via add_small_perturbation in production). Only
            # off-diagonal blocks are well-defined — compare those exactly.
            hw = mine_m.shape[1] // T
            bm = mine_m.reshape(-1, T, hw, T, hw)
            br = ref_m.reshape(-1, T, hw, T, hw)
            offdiag = ~np.eye(T, dtype=bool)[None, :, None, :, None]
            np.testing.assert_array_equal(
                bm & offdiag, br & offdiag, err_msg=f"mask ds {d} (off-diagonal)"
            )


@pytest.mark.parametrize("family", FAMILIES)
def test_apply_model_parity(pairs, family):
    ref, mine, params = pairs(family)
    (z_ref, cond_ref, fs_ref), (z_my, cond_my), jbatch = _both_conds(ref, mine, params, family)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, T, LAT, LAT)).astype(np.float32)
    t_np = np.array([500, 120], np.int64)
    fs = np.array([3, 3], np.int64)

    with torch.no_grad():
        eps_ref = ref.apply_model(
            torch.from_numpy(x), torch.from_numpy(t_np), cond_ref, fs=torch.from_numpy(fs)
        )
    eps_my = mine.apply_model(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(t_np, jnp.int32),
        cond_my,
        jnp.asarray(fs, jnp.int32),
    )
    ref_np = _tj(eps_ref)
    my_np = np.asarray(eps_my)
    scale = np.abs(ref_np).mean() + 1e-8
    assert np.max(np.abs(my_np - ref_np)) / scale < 5e-3, (
        f"apply_model drift: max|d|={np.max(np.abs(my_np - ref_np)):.3e} "
        f"mean|ref|={scale:.3e}"
    )
    np.testing.assert_allclose(my_np, ref_np, rtol=5e-3, atol=5e-4)


def test_ddim_step_parity(pairs):
    """One deterministic (eta=0, no CFG) DDIM step. reference ddim.py:240-346."""
    from camc2v_tpu.core.schedules import DDIMSchedule

    family = "camcontext"
    ref, mine, params = pairs(family)
    (z_ref, cond_ref, fs_ref), (z_my, cond_my), _ = _both_conds(ref, mine, params, family)

    load_ref = refload
    sys.path.append(load_ref.REF_ROOT)
    from lvdm.models.samplers.ddim import DDIMSampler as RefDDIMSampler

    sampler = RefDDIMSampler(ref)
    # the reference register_buffer hardcodes .to("cuda") (ddim.py:19-22);
    # keep buffers on CPU for the oracle run
    import types

    sampler.register_buffer = types.MethodType(
        lambda self, name, attr: setattr(self, name, attr), sampler
    )
    sampler.make_schedule(ddim_num_steps=5, ddim_discretize="uniform_trailing", ddim_eta=0.0, verbose=False)

    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 4, T, LAT, LAT)).astype(np.float32)
    index = 3
    step = int(sampler.ddim_timesteps[index])
    t_t = torch.full((2,), step, dtype=torch.long)
    fs = torch.tensor([3, 3])

    with torch.no_grad():
        x_prev_ref, pred_x0_ref = sampler.p_sample_ddim(
            torch.from_numpy(x), cond_ref, t_t, index, fs=fs
        )

    ddim = DDIMSchedule.create(mine.schedule, 5, "uniform_trailing", 0.0)
    assert int(ddim.timesteps[index]) == step
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    e_t = mine.apply_model(params, xj, jnp.full((2,), step, jnp.int32), cond_my, jnp.array([3, 3], jnp.int32))
    pred_x0 = (xj - ddim.sqrt_one_minus_alphas[index] * e_t) / jnp.sqrt(ddim.alphas[index])
    a_prev = ddim.alphas_prev[index]
    dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev, 0.0, None)) * e_t
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt

    np.testing.assert_allclose(np.asarray(x_prev), _tj(x_prev_ref), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(pred_x0), _tj(pred_x0_ref), rtol=5e-3, atol=5e-3)


def test_dynamic_rescale_parity():
    """use_dynamic_rescale tables + per-step pred_x0 rescale vs the reference.

    reference: ddpm3d.py:523-528 (scale_arr build), samplers/ddim.py:31-33
    (DDIM-step gather), :316-320 (pred_x0 *= prev_scale/scale in the loop).
    """
    import types

    refload.load_reference()
    from lvdm.models.samplers.ddim import DDIMSampler as RefDDIMSampler

    ref = refload.build_ref_model("dynamicrafter")
    # flip dynamic rescale on after construction exactly as the ctor would
    # (ddpm3d.py:523-528); avoids rebuilding the whole tiny model
    base_scale, turning_step = 0.7, 40
    scale_arr1 = np.linspace(1.0, base_scale, turning_step)
    scale_arr2 = np.full(ref.num_timesteps, base_scale)
    ref.use_dynamic_rescale = True
    ref.register_buffer("scale_arr", torch.tensor(
        np.concatenate((scale_arr1, scale_arr2)), dtype=torch.float32))

    sampler = RefDDIMSampler(ref)
    sampler.register_buffer = types.MethodType(
        lambda self, name, attr: setattr(self, name, attr), sampler
    )
    sampler.make_schedule(ddim_num_steps=5, ddim_discretize="uniform_trailing",
                          ddim_eta=0.0, verbose=False)

    import dataclasses

    from camc2v_tpu.core.schedules import DDIMSchedule
    from camc2v_tpu.models.dynamicrafter import DynamiCrafter

    cfg = dataclasses.replace(
        refload.my_model("dynamicrafter").config,
        use_dynamic_rescale=True, base_scale=base_scale, turning_step=turning_step,
    )
    mine = DynamiCrafter(cfg)
    # construction parity: my ctor ramp == the reference buffer (truncated to
    # num_timesteps — the reference tail is never gathered)
    np.testing.assert_allclose(
        np.asarray(mine.scale_arr),
        ref.scale_arr.numpy()[: ref.num_timesteps], rtol=0, atol=0)

    ddim = DDIMSchedule.create(mine.schedule, 5, "uniform_trailing", 0.0,
                               scale_arr=mine.scale_arr)
    np.testing.assert_allclose(
        np.asarray(ddim.scale_arr), sampler.ddim_scale_arr.numpy(), rtol=1e-6, atol=0)
    np.testing.assert_allclose(
        np.asarray(ddim.scale_arr_prev), sampler.ddim_scale_arr_prev.numpy(), rtol=1e-6, atol=0)

    # one-step pred_x0 rescale (eta=0, fixed e_t) vs reference ddim.py:310-346
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, T, LAT, LAT)).astype(np.float32)
    e_t = rng.normal(size=x.shape).astype(np.float32) * 0.1
    index = 3
    a_t = float(sampler.ddim_alphas[index])
    sq1m = float(sampler.ddim_sqrt_one_minus_alphas[index])
    a_prev = float(sampler.ddim_alphas_prev[index])
    pred_x0_ref = (x - sq1m * e_t) / np.sqrt(a_t)
    pred_x0_ref *= float(sampler.ddim_scale_arr_prev[index]) / float(sampler.ddim_scale_arr[index])
    x_prev_ref = np.sqrt(a_prev) * pred_x0_ref + np.sqrt(1.0 - a_prev) * e_t

    pred_x0 = (x - np.asarray(ddim.sqrt_one_minus_alphas)[index] * e_t) / np.sqrt(
        np.asarray(ddim.alphas)[index])
    pred_x0 = pred_x0 * (np.asarray(ddim.scale_arr_prev)[index] / np.asarray(ddim.scale_arr)[index])
    x_prev = np.sqrt(np.asarray(ddim.alphas_prev)[index]) * pred_x0 + np.sqrt(
        1.0 - np.asarray(ddim.alphas_prev)[index]) * e_t
    np.testing.assert_allclose(x_prev, x_prev_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "variant",
    ["epipolar_hybrid_attention", "epipolar_hybrid_attention_v2",
     "only_self_pixel_on_current_frame", "current_frame_as_register_token"],
)
def test_epipolar_mask_variants_golden(pairs, variant):
    """The mask fallback/identity variants vs the reference get_epipolar_mask
    (VERDICT round-1 weak #7: these paths silently drift -> RotErr parity dies).

    Diagonal (t==t) blocks are FP-chaotic (zero translation) and excluded as in
    test_camera_condition_parity; the variants' *structural* edits (identity
    rows, same-frame overrides, fallback rows) are exact off-diagonal."""
    from camc2v_tpu.camera import geometry as G
    from camc2v_tpu.nn.epipolar import EpipolarConfig

    ref, mine, params = pairs("cami2v")
    orig_flags = {
        f: getattr(ref.epipolar_config, f)
        for f in ["epipolar_hybrid_attention", "epipolar_hybrid_attention_v2",
                  "only_self_pixel_on_current_frame", "current_frame_as_register_token"]
    }
    batch = refload.make_batch(b=2)
    K_t = torch.from_numpy(batch["camera_intrinsics"]).float()
    w2c = torch.from_numpy(batch["RT"]).float()
    with torch.no_grad():
        c2w = w2c.inverse()
        rel = ref.get_relative_pose(c2w, torch.zeros(2, dtype=torch.long), mode="left", normalize_T0=False)
        pairs_rt = ref.get_relative_c2w_RT_pairs(rel)
        R_, t_ = pairs_rt[..., :3, :3], pairs_rt[..., :3, 3:4]
        F_ref = ref.get_fundamental_matrix(K_t.unsqueeze(1), R_, t_)

        # flip the variant flag on the reference's (mutable) epipolar config
        for flag in ["epipolar_hybrid_attention", "epipolar_hybrid_attention_v2",
                     "only_self_pixel_on_current_frame", "current_frame_as_register_token"]:
            setattr(ref.epipolar_config, flag, flag == variant)
        d = 8
        try:
            mask_ref = ref.get_epipolar_mask(F_ref, T, IMG // d, IMG // d, d).numpy()
        finally:
            for f, val in orig_flags.items():  # the fixture caches this model
                setattr(ref.epipolar_config, f, val)

    cfg = EpipolarConfig(
        origin_h=IMG, origin_w=IMG, attention_resolution=(2, 1), num_register_tokens=2,
        **{variant: True},
    )
    F_my = jnp.asarray(F_ref.numpy())
    mask_my = np.asarray(G.epipolar_mask(F_my, T, IMG // d, IMG // d, d, cfg))

    hw = (IMG // d) ** 2
    bm = mask_my.reshape(-1, T, hw, T, hw)
    br = mask_ref.reshape(-1, T, hw, T, hw)
    offdiag = ~np.eye(T, dtype=bool)[None, :, None, :, None]
    np.testing.assert_array_equal(bm & offdiag, br & offdiag, err_msg=variant)
    # same-frame structural overrides are deterministic even on the diagonal
    if variant in ("only_self_pixel_on_current_frame", "current_frame_as_register_token"):
        diag_m = bm[:, np.arange(T), :, np.arange(T), :]
        diag_r = br[:, np.arange(T), :, np.arange(T), :]
        np.testing.assert_array_equal(diag_m, diag_r, err_msg=f"{variant} diagonal")


@pytest.mark.parametrize("family", ["camcontext", "motionctrl"])
def test_export_state_dict_whole_model_roundtrip(pairs, family):
    """export_state_dict inverts the import exactly: with the randomized
    reference state dict as template, every exported tensor must equal the
    value it was imported from (transposes are exact in f32), and passthrough
    keys keep their template values — so the whole dict round-trips back into
    the reference's own load path (main/utils_train.py:165-214)."""
    from camc2v_tpu.utils.torch_import import export_state_dict

    ref, mine, params = pairs(family)
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    out, report = export_state_dict(params, sd, mine.config.unet, strict=False)

    assert set(out) == set(sd)
    assert len(report["exported"]) > 50
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    # only the dummy-encoder CLIP towers may be missing from the pytree
    missing = [t for _, t in report["missing_params"]
               if not t.startswith(("clip_text/", "clip_vision/"))]
    assert not missing, missing[:10]
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k]), k
