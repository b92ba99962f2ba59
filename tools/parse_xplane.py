"""Aggregate a jax.profiler xplane trace into an op-level self-time table.

Usage: python tools/parse_xplane.py /tmp/unet_profile
Prints per-op-category and per-op totals for the TPU device plane.
"""

from __future__ import annotations

import collections
import glob
import sys


def main(logdir: str, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane.pb under {logdir}"
    path = paths[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        stats_meta = plane.stat_metadata
        totals = collections.Counter()
        counts = collections.Counter()
        cats = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = ev_meta[ev.metadata_id]
                name = meta.name
                dur_us = ev.duration_ps / 1e6
                totals[name] += dur_us
                counts[name] += 1
                cat = None
                for st in ev.stats:
                    sname = stats_meta[st.metadata_id].name
                    if sname in ("equation", "hlo_category"):
                        cat = st.str_value or stats_meta.get(st.metadata_id).name
                    if sname == "hlo_category":
                        cat = st.str_value
                cats[cat or _guess_cat(name)] += dur_us
        if not totals:
            continue
        print(f"== plane: {plane.name}")
        total = sum(totals.values())
        print(f"total device-op time: {total / 1e3:.3f} ms (all iters)")
        print("\n-- by category --")
        for cat, us in cats.most_common():
            print(f"{us / 1e3:10.3f} ms  {100 * us / total:5.1f}%  {cat}")
        print(f"\n-- top {top} ops --")
        for name, us in totals.most_common(top):
            print(f"{us / 1e3:10.3f} ms  {100 * us / total:5.1f}%  x{counts[name]:<4d} {name[:110]}")


def _guess_cat(name: str) -> str:
    n = name.lower()
    for key in ("conv", "dot", "fusion", "copy", "all-reduce", "reduce", "custom-call", "transpose"):
        if key in n:
            return key
    return "other"


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/unet_profile")
