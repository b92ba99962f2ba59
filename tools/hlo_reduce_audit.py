"""Inventory reduce ops (norm stats, softmax sums, means) in the flagship
UNet denoise step, with source attribution.

Traces `__graft_entry__.entry()` on CPU (no compile, no TPU claim) and walks
the closed jaxpr for `reduce_sum`/`reduce_max`/etc. primitives, grouping by
the user source line that emitted them. Reduces that show up here but are NOT
inside a Pallas kernel are candidates for the `convert_reduce_fusion` pool in
the TPU profile (PERF.md).

Usage: python tools/hlo_reduce_audit.py
"""
from __future__ import annotations

import collections
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REDUCE_PRIMS = {"reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
                "argmax", "argmin", "reduce_and", "reduce_or"}


def _walk(jaxpr, out, stack=()):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in REDUCE_PRIMS:
            src = jax.core.eqns_source_info(eqn) if hasattr(jax.core, "eqns_source_info") else None
            tb = eqn.source_info.traceback
            frame = None
            if tb is not None:
                for f in tb.frames:
                    fn = f.file_name
                    if "camc2v_tpu" in fn and "/ops/" not in fn:
                        frame = f
                        break
                if frame is None:
                    for f in tb.frames:
                        if "camc2v_tpu" in fn:
                            frame = f
                            break
            line = getattr(frame, "start_line", None) or getattr(frame, "line_num", "?") if frame else "?"
            where = f"{frame.file_name.split('camc2v_tpu/')[-1]}:{line}" if frame else "?"
            shape = tuple(eqn.invars[0].aval.shape)
            dtype = str(eqn.invars[0].aval.dtype)
            out[(name, where, dtype)][shape] += 1
        for sub in jax.core.subjaxprs(eqn.jaxpr) if False else ():
            pass
        # recurse into call/scan/pjit bodies
        for param in ("jaxpr", "call_jaxpr", "branches"):
            v = eqn.params.get(param)
            if v is None:
                continue
            vs = v if isinstance(v, (list, tuple)) else [v]
            for sub in vs:
                core_jaxpr = getattr(sub, "jaxpr", sub)
                if hasattr(core_jaxpr, "eqns"):
                    _walk(core_jaxpr, out, stack + (name,))


def main():
    import __graft_entry__ as E

    fn, args = E.entry()
    # Reflect TPU dispatch decisions in the trace: every fused-kernel gate in
    # camc2v_tpu keys on jax.default_backend() != "cpu". pallas_call only
    # STAGES during make_jaxpr, so nothing Mosaic actually compiles here.
    if "--tpu-dispatch" in sys.argv:
        jax.default_backend = lambda: "tpu"
        for mod in ("camc2v_tpu.ops.attention", "camc2v_tpu.ops.temporal_attention",
                    "camc2v_tpu.ops.geglu_ff", "camc2v_tpu.ops.groupnorm",
                    "camc2v_tpu.nn.layers"):
            m = __import__(mod, fromlist=["jax"])
            if hasattr(m, "jax"):
                m.jax.default_backend = lambda: "tpu"
    closed = jax.make_jaxpr(fn)(*args)
    out = collections.defaultdict(collections.Counter)
    _walk(closed.jaxpr, out)
    rows = []
    for (prim, where, dtype), shapes in out.items():
        total = sum(shapes.values())
        rows.append((total, prim, where, dtype, dict(shapes)))
    rows.sort(reverse=True)
    print(f"{'count':>5}  {'prim':<12} {'dtype':<10} where / shapes")
    for total, prim, where, dtype, shapes in rows:
        print(f"{total:>5}  {prim:<12} {dtype:<10} {where}")
        for shp, n in sorted(shapes.items(), key=lambda kv: -kv[1])[:4]:
            print(f"{'':>5}  {'':<12} {'':<10}   {n}x {shp}")


if __name__ == "__main__":
    main()
