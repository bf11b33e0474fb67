"""Aggregate the TPU plane by line, then bucket ops into categories."""
import glob
import re
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = sorted(glob.glob("/tmp/jax_trace/**/*.xplane.pb", recursive=True))
space = xplane_pb2.XSpace()
with open(xs[-1], "rb") as f:
    space.ParseFromString(f.read())


def bucket(name):
    if "copy-start" in name or "copy-done" in name:
        return "async-copy"
    if "_slab_attention" in name:
        m = re.search(r"bf16\[3,(\d+),(\d+),(\d+),(\d+)\]", name)
        shape = m.groups() if m else ("?",)
        return f"slab-bwd T={shape[0] if m else '?'}"
    if "slab" in name or "gva" in name.lower():
        return "slab-other"
    if "custom-call" in name or "tpu_custom_call" in name:
        return "custom-call(pallas)"
    if "scatter" in name:
        return "scatter"
    if "gather" in name:
        return "gather"
    if "sort" in name:
        return "sort"
    if "fusion" in name:
        return "fusion"
    if "convolution" in name or "dot" in name:
        return "matmul"
    return "other"


for plane in space.planes:
    if "TPU" not in plane.name:
        continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        tot = defaultdict(float)
        n = defaultdict(int)
        for ev in line.events:
            nm = meta.get(ev.metadata_id, str(ev.metadata_id))
            tot[bucket(nm)] += ev.duration_ps / 1e9
            n[bucket(nm)] += 1
        s = sum(tot.values())
        if s < 10:
            continue
        print(f"-- line '{line.name}' total {s:.1f} ms --")
        for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {v:9.1f} ms x{n[k]:<5d} {k}")

# detail: top non-copy events on the busiest line
print("\n== top non-copy ops ==")
for plane in space.planes:
    if "TPU" not in plane.name:
        continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    best, events = None, None
    for line in plane.lines:
        s = sum(
            ev.duration_ps / 1e9
            for ev in line.events
            if "copy-" not in meta.get(ev.metadata_id, "")
        )
        if best is None or s > best[0]:
            best = (s, line)
    tot = defaultdict(float)
    n = defaultdict(int)
    meta2 = meta
    for ev in best[1].events:
        nm = meta2.get(ev.metadata_id, str(ev.metadata_id))
        if "copy-" in nm:
            continue
        key = nm.split(" = ")[0]
        tot[key] += ev.duration_ps / 1e9
        n[key] += 1
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:9.2f} ms x{n[k]:<4d} {k[:100]}")
