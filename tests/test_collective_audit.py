"""Parsing helpers of tools/collective_audit.py (the compile-only multi-chip
communication audit): HLO shape-byte accounting and collective-op extraction.
The flagship compile itself runs out-of-band (tools/collective_audit.py);
these tests pin the text-parsing layer the audit's numbers depend on."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from collective_audit import audit_hlo_text, shape_bytes  # noqa: E402


def test_shape_bytes():
    assert shape_bytes("f32[8,128]{1,0}") == 8 * 128 * 4
    assert shape_bytes("bf16[2,16,32,32,4]") == 2 * 16 * 32 * 32 * 4 * 2
    assert shape_bytes("pred[7]") == 7
    assert shape_bytes("(f32[4,4]{1,0}, bf16[8]{0})") == 64 + 16
    assert shape_bytes("f32[]") == 4  # scalar: empty dims product = 1
    assert shape_bytes("token[]") == 0  # unknown dtype contributes nothing


def test_audit_hlo_text_counts_and_bytes():
    text = """
  ENTRY %main {
    %ar = f32[1024,256]{1,0} all-reduce(%x), replica_groups={}, to_apply=%sum
    %ag.1 = bf16[512,512]{1,0} all-gather(%y), dimensions={0}
    %ars = f32[128]{0} reduce-scatter(%z), dimensions={0}
    %cp = f32[64,64]{1,0} collective-permute(%w), source_target_pairs={{0,1}}
    %ar2.s = (f32[16]{0}, f32[16]{0}) all-reduce-start(%a, %b)
    %ar2.d = (f32[16]{0}, f32[16]{0}) all-reduce-done(%ar2.s)
    %not.a.collective = f32[4]{0} add(%p, %q)
  }
"""
    out = audit_hlo_text(text)
    assert out["all-reduce"]["count"] == 2  # plain + -start (not -done)
    assert out["all-reduce"]["bytes"] == 1024 * 256 * 4 + 2 * 16 * 4
    assert out["all-gather"] == {"count": 1, "bytes": 512 * 512 * 2}
    assert out["reduce-scatter"]["bytes"] == 128 * 4
    assert out["collective-permute"]["count"] == 1
    assert "add" not in out and "f32" not in out


def test_audit_hlo_text_ignores_non_ops():
    assert audit_hlo_text("// comment\nHloModule foo\n") == {}
