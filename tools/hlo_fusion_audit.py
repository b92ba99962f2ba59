"""Offline audit of fusion ops in a dumped HLO text (tools/dump_hlo.py).

For every fusion computation: result/operand bytes (the HBM traffic bound for
a loop fusion), op mix (transposes / broadcasts / converts / arithmetic), and
a shape-grouped ranking that lines up with the profile table
(docs/profiles/r3e_unet_top80.txt groups by result shape). Cross-referencing
the two separates fusions that are slow because they MOVE a lot (relayout /
many-operand broadcast chains — attackable by upstream layout changes) from
fusions already at the HBM floor.

Usage:
  python tools/hlo_fusion_audit.py /tmp/unet_step.hlo.txt [--top 30]
  python tools/hlo_fusion_audit.py /tmp/unet_step.hlo.txt --shape 'bf16[2,16,8,8,1280]'
"""

from __future__ import annotations

import argparse
import collections
import re

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(s: str) -> int:
    """Total bytes of all array shapes in a type string (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(s):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_computations(text: str) -> dict:
    """name -> {'params': [type...], 'result': type, 'body': [op-lines]}."""
    comps = {}
    cur = None
    for line in text.splitlines():
        m = re.match(r"^(?:ENTRY )?%?([\w.\-]+)(?:\.clone)? \((.*)\) -> (.+) \{", line)
        if m:
            name, params, result = m.groups()
            cur = {"params": re.findall(r": (\w+\[[\d,]*\](?:\{[^}]*\})?)", params),
                   "result": result.strip(), "body": []}
            comps[name] = cur
            continue
        if cur is not None:
            if line.startswith("}"):
                cur = None
            else:
                cur["body"].append(line.strip())
    return comps


_OP_RE = re.compile(r"= *(?:\([^)]*\)|[\w\[\],]+)?\{?[^=]*?(\w[\w\-]*)\(")


def op_mix(body: list) -> collections.Counter:
    mix = collections.Counter()
    for line in body:
        # '%x = bf16[...]{...} opcode(...), ...'
        m = re.match(r"^(?:ROOT )?%?[\w.\-]+ = \S+ ([\w\-]+)\(", line)
        if m:
            mix[m.group(1)] += 1
    return mix


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo_file")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--shape", default=None,
                    help="print full op mix for fusions with this result shape prefix")
    args = ap.parse_args()

    text = open(args.hlo_file).read()
    comps = parse_computations(text)

    # fusion call sites: '%fusion.N = <type> fusion(...), kind=..., calls=%comp'
    fus_re = re.compile(
        r"%?([\w.\-]+) = ([^ ]+) fusion\(([^)]*)\).*?kind=(\w+).*?calls=%?([\w.\-]+)"
    )
    rows = []
    for m in fus_re.finditer(text):
        name, rtype, _operands, kind, callee = m.groups()
        c = comps.get(callee)
        if c is None:
            continue
        out_b = shape_bytes(rtype)
        in_b = sum(shape_bytes(p) for p in c["params"])
        mix = op_mix(c["body"])
        rows.append({
            "name": name, "shape": rtype.split("{")[0], "kind": kind,
            "out_mb": out_b / 1e6, "in_mb": in_b / 1e6,
            "traffic_mb": (out_b + in_b) / 1e6, "n_operands": len(c["params"]),
            "mix": mix,
        })

    if args.shape:
        hits = [r for r in rows if r["shape"].startswith(args.shape)]
        print(f"{len(hits)} fusions with result {args.shape}:")
        for r in hits[: args.top]:
            interesting = {k: v for k, v in r["mix"].items()
                           if k not in ("parameter",)}
            print(f"  {r['name']}: kind={r['kind']} in={r['in_mb']:.1f}MB "
                  f"out={r['out_mb']:.1f}MB ops={dict(interesting)}")
        return

    groups = collections.defaultdict(lambda: {"n": 0, "traffic": 0.0,
                                              "mix": collections.Counter()})
    for r in rows:
        g = groups[r["shape"]]
        g["n"] += 1
        g["traffic"] += r["traffic_mb"]
        g["mix"].update(r["mix"])

    print(f"{len(rows)} fusions, {len(groups)} result-shape groups; "
          f"total in+out traffic {sum(r['traffic_mb'] for r in rows) / 1e3:.2f} GB")
    print(f"{'result shape':<36} {'n':>4} {'traffic MB':>11}  top ops")
    for shape, g in sorted(groups.items(), key=lambda kv: -kv[1]["traffic"])[: args.top]:
        top = ", ".join(f"{k}x{v}" for k, v in g["mix"].most_common(6)
                        if k != "parameter")
        print(f"{shape:<36} {g['n']:>4} {g['traffic']:>11.1f}  {top}")


if __name__ == "__main__":
    main()
