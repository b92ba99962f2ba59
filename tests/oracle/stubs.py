"""sys.modules stubs so the reference model code imports without its heavy deps.

The reference model stack (lvdm/, model/, baseline/) needs:
  pytorch_lightning  - base class + rank_zero_only decorator (behavioural stub)
  torchvision.utils  - make_grid (never called in the paths we exercise)
  diffusers          - Attention / FeedForward used by the camera pose encoder.
                       These ARE numerically load-bearing, so the stubs below
                       are faithful re-implementations of the diffusers modules
                       (standard softmax attention + GEGLU FF with the exact
                       diffusers parameter names/shapes).

Only installed for names that are genuinely missing; never shadows a real
install.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


def _mod(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


# --------------------------------------------------------------------- pl
def _install_pytorch_lightning():
    pl = _mod("pytorch_lightning")

    class LightningModule(nn.Module):
        def __init__(self):
            super().__init__()
            self.trainer = None
            self.global_step = 0
            self.current_epoch = 0
            self.learning_rate = 1e-4

        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

        def save_hyperparameters(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

        def log_dict(self, *a, **k):
            pass

    class Callback:
        pass

    pl.LightningModule = LightningModule
    pl.Callback = Callback
    pl.Trainer = object
    pl.seed_everything = lambda *a, **k: None

    util = _mod("pytorch_lightning.utilities")

    def rank_zero_only(fn):
        return fn

    util.rank_zero_only = rank_zero_only
    util.rank_zero_info = lambda *a, **k: None
    pl.utilities = util


# ------------------------------------------------------------- torchvision
def _install_torchvision():
    tv = _mod("torchvision")
    utils = _mod("torchvision.utils")

    def make_grid(*a, **k):
        raise NotImplementedError("torchvision stub: make_grid not available")

    utils.make_grid = make_grid
    tv.utils = utils


# ---------------------------------------------------------------- diffusers
class _AttnProcessor:
    """diffusers.models.attention_processor.AttnProcessor (classic softmax)."""

    def __call__(self, attn, hidden_states, encoder_hidden_states=None, attention_mask=None, **kwargs):
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        q = attn.to_q(hidden_states)
        k = attn.to_k(ctx)
        v = attn.to_v(ctx)
        b, n, _ = q.shape
        h = attn.heads
        q = q.view(b, n, h, -1).transpose(1, 2)  # b h n d
        k = k.view(b, k.shape[1], h, -1).transpose(1, 2)
        v = v.view(b, v.shape[1], h, -1).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-1, -2)) * attn.scale
        if attention_mask is not None:
            scores = scores + attention_mask
        probs = scores.softmax(dim=-1)
        out = torch.matmul(probs, v)  # b h n d
        out = out.transpose(1, 2).reshape(b, n, -1)
        out = attn.to_out[0](out)
        out = attn.to_out[1](out)
        if getattr(attn, "rescale_output_factor", 1.0) != 1.0:
            out = out / attn.rescale_output_factor
        return out


class _DiffusersAttention(nn.Module):
    """Faithful subset of diffusers.models.attention_processor.Attention."""

    def __init__(
        self,
        query_dim,
        cross_attention_dim=None,
        heads=8,
        dim_head=64,
        dropout=0.0,
        bias=False,
        upcast_attention=False,
        upcast_softmax=False,
        out_bias=True,
        scale_qk=True,
        only_cross_attention=False,
        eps=1e-5,
        rescale_output_factor=1.0,
        residual_connection=False,
        processor=None,
        **kwargs,
    ):
        super().__init__()
        inner_dim = dim_head * heads
        cross_attention_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
        self.heads = heads
        self.scale = dim_head**-0.5 if scale_qk else 1.0
        self.upcast_attention = upcast_attention
        self.rescale_output_factor = rescale_output_factor
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner_dim, query_dim, bias=out_bias), nn.Dropout(dropout)])
        self.processor = processor if processor is not None else _AttnProcessor()

    def forward(self, hidden_states, encoder_hidden_states=None, attention_mask=None, **kwargs):
        return self.processor(
            self, hidden_states, encoder_hidden_states=encoder_hidden_states,
            attention_mask=attention_mask, **kwargs,
        )


class _GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class _DiffusersFeedForward(nn.Module):
    """diffusers.models.attention.FeedForward (geglu variant)."""

    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0, activation_fn="geglu", **kwargs):
        super().__init__()
        inner_dim = int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim
        assert activation_fn == "geglu", f"stub only supports geglu, got {activation_fn}"
        self.net = nn.ModuleList([_GEGLU(dim, inner_dim), nn.Dropout(dropout), nn.Linear(inner_dim, dim_out)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


def _install_diffusers():
    diffusers = _mod("diffusers")
    models = _mod("diffusers.models")
    attention_processor = _mod("diffusers.models.attention_processor")
    attention = _mod("diffusers.models.attention")
    attention_processor.Attention = _DiffusersAttention
    attention_processor.AttnProcessor = _AttnProcessor
    attention.FeedForward = _DiffusersFeedForward
    models.attention_processor = attention_processor
    models.attention = attention
    diffusers.models = models


_INSTALLERS = {
    "pytorch_lightning": _install_pytorch_lightning,
    "torchvision": _install_torchvision,
    "diffusers": _install_diffusers,
}


def install_stubs():
    for name, installer in _INSTALLERS.items():
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            installer()
