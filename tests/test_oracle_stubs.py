"""Guards on the oracle's diffusers stubs (VERDICT r2 #8).

The pose-encoder parity gate instantiates the reference against
tests/oracle/stubs.py re-implementations of diffusers Attention/FeedForward.
Two guards keep them honest:

  1. a state_dict CONTRACT test that always runs: the stub must expose exactly
     the parameter names/shapes diffusers v0.31.0 creates for the pose
     encoder's ctor arguments (the importer keys off these names, and a silent
     layout drift would make both sides agree and both be wrong);
  2. a NUMERIC equivalence test that runs whenever a real diffusers package is
     importable (any dev machine with it installed): stub forward == real
     forward on shared weights. Skipped in this zero-egress image.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.append(str(Path(__file__).parent / "oracle"))

from stubs import _DiffusersAttention, _DiffusersFeedForward  # noqa: E402

HAS_REAL_DIFFUSERS = importlib.util.find_spec("diffusers") is not None


def test_attention_state_dict_contract():
    attn = _DiffusersAttention(query_dim=32, heads=2, dim_head=8, dropout=0.0, bias=False)
    sd = attn.state_dict()
    assert sorted(sd.keys()) == [
        "to_k.weight", "to_out.0.bias", "to_out.0.weight", "to_q.weight", "to_v.weight",
    ]
    assert sd["to_q.weight"].shape == (16, 32)  # (heads*dim_head, query_dim)
    assert sd["to_out.0.weight"].shape == (32, 16)
    assert attn.scale == pytest.approx(8 ** -0.5)

    ff = _DiffusersFeedForward(24, dropout=0.0, activation_fn="geglu")
    sd = ff.state_dict()
    assert sorted(sd.keys()) == [
        "net.0.proj.bias", "net.0.proj.weight", "net.2.bias", "net.2.weight",
    ]
    assert sd["net.0.proj.weight"].shape == (24 * 4 * 2, 24)
    assert sd["net.2.weight"].shape == (24, 24 * 4)


@pytest.mark.skipif(not HAS_REAL_DIFFUSERS, reason="real diffusers not installed")
def test_stub_matches_real_diffusers():
    from diffusers.models.attention import FeedForward as RealFF
    from diffusers.models.attention_processor import Attention as RealAttn

    torch.manual_seed(0)
    real = RealAttn(query_dim=32, heads=2, dim_head=8, dropout=0.0, bias=False).eval()
    stub = _DiffusersAttention(query_dim=32, heads=2, dim_head=8, dropout=0.0, bias=False).eval()
    stub.load_state_dict(real.state_dict())
    x = torch.randn(3, 7, 32)
    with torch.no_grad():
        # the reference calls the processor directly with no mask/context
        # (camera_pose_encoder.py:143-149) — compare the same entry point
        out_real = real.processor(real, x, encoder_hidden_states=None, attention_mask=None)
        out_stub = stub.processor(stub, x, encoder_hidden_states=None, attention_mask=None)
    np.testing.assert_allclose(out_stub.numpy(), out_real.numpy(), rtol=1e-5, atol=1e-6)

    real_ff = RealFF(24, dropout=0.0, activation_fn="geglu").eval()
    stub_ff = _DiffusersFeedForward(24, dropout=0.0, activation_fn="geglu").eval()
    stub_ff.load_state_dict(real_ff.state_dict())
    y = torch.randn(3, 7, 24)
    with torch.no_grad():
        np.testing.assert_allclose(
            stub_ff(y).numpy(), real_ff(y).numpy(), rtol=1e-5, atol=1e-6
        )
