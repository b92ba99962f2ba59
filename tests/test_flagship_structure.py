"""Flagship-scale structural validation (eval_shape only — no allocation).

Asserts the production CamContextI2V-256 preset builds the expected parameter
inventory: a drifting count means a structural regression (missing blocks,
wrong widths) that tiny-config tests can't see.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def flagship_shapes():
    from camc2v_tpu.models.camcontexti2v import CamContextI2V
    from camc2v_tpu.presets import camcontexti2v_256

    m = CamContextI2V(camcontexti2v_256(), dtype=jnp.bfloat16)
    return jax.eval_shape(lambda: m.init_params(jax.random.key(0), (256, 256)))


def _count(tree) -> float:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree)) / 1e6


EXPECTED_M = {
    "unet": 1500.9,        # DynamiCrafter backbone + plucker/epipolar adapters
    "vae": 83.7,
    "clip_text": 340.4,    # ViT-H text, penultimate (last block dropped)
    "clip_vision": 630.8,  # ViT-H visual, full tower (no ln_post/proj)
    "image_proj": 50.9,    # Resampler (16 queries x 16 frames)
    "pose_encoder": 199.3,
    "adaptor": 46.5,       # MultiLatentEpipolarAdaptor depth 12
}


@pytest.mark.parametrize("component,expected", sorted(EXPECTED_M.items()))
def test_flagship_component_param_counts(flagship_shapes, component, expected):
    got = _count(flagship_shapes[component])
    assert got == pytest.approx(expected, rel=0.02), f"{component}: {got:.1f}M vs {expected}M"


def test_flagship_total_and_zero_conv(flagship_shapes):
    total = _count(flagship_shapes)
    assert total == pytest.approx(2852.3, rel=0.02)
    # zero-conv latent projector: 4->4 3x3x3 conv + bias = 436 params
    assert sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(flagship_shapes["zero_conv"])) == 4 * 4 * 27 + 4


def test_flagship_latent_contract(flagship_shapes):
    # UNet in 8ch (4 latent + 4 concat cond), out 4ch, conv_in kernel shape
    k = flagship_shapes["unet"]["conv_in"]["kernel"]
    assert tuple(k.shape) == (3, 3, 8, 320)
    out = flagship_shapes["unet"]["out_conv"]["kernel"]
    assert tuple(out.shape) == (3, 3, 320, 4)
