"""Summarize a jax.profiler TPU device trace (*.xplane.pb): top ops by
self-time, grouped by fusion/op name. Usage:

    python scripts/parse_xplane.py /tmp/trace_dir [top_n] [line_substr]

``line_substr`` picks the trace line to break down (default: the busiest —
usually 'Async XLA Ops', whose async copy durations overlap real compute
and overstate; pass 'XLA Ops' for the synchronous op timeline).

Finds the newest .xplane.pb under the directory. CPU-side tool (run with
JAX_PLATFORMS=cpu env pins if jax gets imported — it doesn't here).
"""
import collections
import glob
import os
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no xplane.pb under {root}"
    path = paths[-1]
    print(f"# {path}")
    sp = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        sp.ParseFromString(f.read())

    for plane in sp.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        evm = plane.event_metadata
        # self time per event name over all lines (XLA op lines)
        agg = collections.Counter()
        cnt = collections.Counter()
        total_line = {}
        for line in plane.lines:
            dur = 0
            for ev in line.events:
                name = evm[ev.metadata_id].name
                agg[(line.name, name)] += ev.duration_ps
                cnt[(line.name, name)] += 1
                dur += ev.duration_ps
            total_line[line.name] = total_line.get(line.name, 0) + dur
        print(f"\n== plane: {plane.name}")
        for ln, d in sorted(total_line.items(), key=lambda kv: -kv[1]):
            print(f"  line {ln}: {d / 1e9:.3f} ms total")
        # pick the busiest line (usually 'XLA Ops' / steps)
        if not total_line:
            continue
        if len(sys.argv) > 3:
            want = [ln for ln in total_line if sys.argv[3] in ln]
            busiest = min(want, key=len) if want else \
                max(total_line, key=total_line.get)
        else:
            busiest = max(total_line, key=total_line.get)
        rows = [(v, k[1], cnt[k]) for k, v in agg.items() if k[0] == busiest]
        rows.sort(reverse=True)
        print(f"\n  top {top_n} ops on line '{busiest}':")
        tot = sum(v for v, _, _ in rows) or 1
        shown = 0
        for v, name, c in rows[:top_n]:
            print(f"    {v / 1e9:9.3f} ms  {100 * v / tot:5.1f}%  x{c:<5d} "
                  f"{name[:110]}")
            shown += v
        print(f"    ({100 * shown / tot:.1f}% of line shown)")

        # grouped by coarse kind
        def kind(name):
            n = name.lower()
            for pat, k in [
                (r"custom-call|pallas|warp", "pallas/custom"),
                (r"fusion", "fusion"),
                (r"conv", "conv"),
                (r"dot|einsum|matmul", "dot"),
                (r"copy|transpose|bitcast", "copy/transpose"),
                (r"all-reduce|collective", "collective"),
                (r"dynamic-slice|gather|scatter", "gather/scatter"),
            ]:
                if re.search(pat, n):
                    return k
            return "other"

        g = collections.Counter()
        for v, name, _ in rows:
            g[kind(name)] += v
        print("\n  by kind:")
        for k, v in g.most_common():
            print(f"    {v / 1e9:9.3f} ms  {100 * v / tot:5.1f}%  {k}")


if __name__ == "__main__":
    main()
