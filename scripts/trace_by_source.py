"""Join a TPU xplane trace with the dumped optimized HLO: attribute device
time to python source file:line (from HLO metadata).

Usage: python scripts/trace_by_source.py /tmp/fsnet_trace2 [top_n] [filter]
Expects optimized_hlo.txt inside the trace dir (scripts/tpu_trace.py dumps it).
"""
import collections
import glob
import os
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load_meta(hlo_path):
    meta = {}
    pat = re.compile(
        r"%([\w.\-]+) = .*?source_file=\"([^\"]+)\" source_line=(\d+)")
    opname = re.compile(r"%([\w.\-]+) = .*?op_name=\"([^\"]+)\"")
    for ln in open(hlo_path):
        m = pat.search(ln)
        o = opname.search(ln)
        if m:
            meta[m.group(1)] = (f"{m.group(2).split('/')[-1]}:{m.group(3)}",
                                o.group(2).split("/")[-1] if o else "")
    return meta


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    filt = sys.argv[3] if len(sys.argv) > 3 else ""
    hlo = os.path.join(root, "optimized_hlo.txt")
    meta = load_meta(hlo)
    path = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                            recursive=True), key=os.path.getmtime)[-1]
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(path, "rb").read())
    plane = [p for p in sp.planes if p.name == "/device:TPU:0"][0]
    evm = plane.event_metadata
    line = [ln for ln in plane.lines if ln.name == "XLA Ops"][0]
    agg = collections.Counter()
    steps = 4
    for ev in line.events:
        name = evm[ev.metadata_id].name.split(" = ")[0].lstrip("%")
        src, op = meta.get(name, ("<unknown>", ""))
        agg[src] += ev.duration_ps
    tot = sum(agg.values())
    print(f"total {tot / steps / 1e9:.2f} ms/step  (by source line)")
    for src, v in agg.most_common():
        if filt and filt not in src:
            continue
        print(f"  {v / steps / 1e9:8.3f} ms {100 * v / tot:5.1f}%  {src}")
        top_n -= 1
        if top_n <= 0:
            break


if __name__ == "__main__":
    main()
