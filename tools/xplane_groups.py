"""Aggregate an xplane trace by op-family (name prefix), per iteration.

Usage: python tools/xplane_groups.py /tmp/unet_profile_r3 [--iters 5]
Groups HLO op names by their base name (strip %, trailing .N, digits) so the
table reads as "epipolar_attn: X ms/iter across N sites" instead of 40 rows.
"""

from __future__ import annotations

import argparse
import collections
import glob
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{args.logdir}/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane.pb under {args.logdir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        groups = collections.Counter()
        sites = collections.defaultdict(set)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                short = name.lstrip("%").split(" = ")[0]
                base = re.sub(r"\.\d+$", "", short)
                base = re.sub(r"\d+$", "", base)
                # annotate with output shape when present for conv/fusion families
                m = re.search(r" = (\S+?)\[([\d,]*)\]", name)
                if m and base in ("fusion", "convolution", "copy", "bitcast", "transpose",
                                  "convolution_add_fusion", "add_add_fusion", "convert_reduce_fusion"):
                    base = f"{base} {m.group(1)}[{m.group(2)}]"
                groups[base] += ev.duration_ps / 1e6  # us
                sites[base].add(short)
        if not groups:
            continue
        total = sum(groups.values())
        print(f"== {plane.name}: {total / 1e3 / args.iters:.2f} ms/iter ==")
        for base, us in groups.most_common(args.top):
            per = us / 1e3 / args.iters
            print(f"{per:9.3f} ms/iter {100 * us / total:5.1f}%  x{len(sites[base]):<4d} {base}")


if __name__ == "__main__":
    main()
