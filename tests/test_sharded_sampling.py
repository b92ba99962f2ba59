"""Data-parallel sharded generation over a virtual 8-device CPU mesh.

reference: 02_generate_videos.py runs one process per GPU; here one SPMD
program spans the mesh (camc2v_tpu/parallel/sampling.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camc2v_tpu.models.dynamicrafter import DynamiCrafter
from camc2v_tpu.parallel.mesh import DATA_AXIS, make_mesh
from camc2v_tpu.parallel.sampling import make_sharded_sampler

from test_dynamicrafter import IMG, T, tiny_config


@pytest.fixture(scope="module")
def model_and_params():
    model = DynamiCrafter(tiny_config(), dtype=jnp.float32)
    params = model.init_params(jax.random.key(0), image_hw=(IMG, IMG))
    k = params["unet"]["out_conv"]["kernel"]
    params["unet"]["out_conv"]["kernel"] = 0.02 * jax.random.normal(jax.random.key(9), k.shape, k.dtype)
    return model, params


def _batch(b):
    rng = np.random.default_rng(0)
    return {
        "video": jnp.asarray(rng.uniform(-1, 1, (b, T, IMG, IMG, 3)), jnp.float32),
        "caption_tokens": jnp.zeros((b, 7), jnp.int32),
        "frame_stride": jnp.full((b,), 3, jnp.int32),
    }


SAMPLE_KW = dict(ddim_steps=2, guidance_scale=2.0, decode=False)


def test_sharded_matches_single_device(model_and_params):
    model, params = model_and_params
    mesh = make_mesh()
    assert mesh.size == 8
    sampler = make_sharded_sampler(model, mesh, SAMPLE_KW)
    batch = _batch(8)
    key = jax.random.key(3)

    out = sampler(params, batch, key)
    ref = model.sample(params, batch, key, **SAMPLE_KW)
    assert out.shape == ref.shape and out.shape[0] == 8

    # output committed to the batch-sharded layout
    spec = out.sharding.spec
    assert spec and spec[0] == DATA_AXIS

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_indivisible_batch_rejected(model_and_params):
    model, params = model_and_params
    mesh = make_mesh()
    sampler = make_sharded_sampler(model, mesh, SAMPLE_KW)
    with pytest.raises(ValueError, match="not divisible"):
        sampler(params, _batch(3), jax.random.key(0))


def test_generate_videos_sharded_dir_contract(model_and_params, tmp_path):
    """generate_videos(mesh=...) writes the same per-video directories."""
    from camc2v_tpu.main.harness import generate_videos

    model, params = model_and_params
    mesh = make_mesh()

    b = 8
    batch = {k: np.asarray(v) for k, v in _batch(b).items()}
    batch["caption"] = [f"cap {i}" for i in range(b)]
    dl = [batch]

    written = generate_videos(
        model, params, dl, str(tmp_path),
        sample_kwargs=dict(ddim_steps=2, guidance_scale=2.0),
        mesh=mesh, skip_existing=False,
    )
    assert len(written) == b
    import os

    for d in written:
        assert os.path.exists(os.path.join(d, "generated.mp4"))
        assert os.path.exists(os.path.join(d, "ground_truth.mp4"))
