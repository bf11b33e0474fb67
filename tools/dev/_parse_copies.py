"""Correct per-kernel accounting: bucket by op name (before ' = ') only."""
import glob
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = sorted(glob.glob("/tmp/jax_trace/**/*.xplane.pb", recursive=True))
space = xplane_pb2.XSpace()
with open(xs[-1], "rb") as f:
    space.ParseFromString(f.read())


def opname(nm):
    return nm.split(" = ")[0].lstrip("%")


def root(nm):
    # strip trailing .NN instance suffix
    n = opname(nm)
    parts = n.rsplit(".", 1)
    return parts[0] if len(parts) == 2 and parts[1].isdigit() else n


for plane in space.planes:
    if "TPU" not in plane.name:
        continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        tot = defaultdict(float)
        n = defaultdict(int)
        for ev in line.events:
            nm = meta.get(ev.metadata_id, str(ev.metadata_id))
            tot[root(nm)] += ev.duration_ps / 1e9
            n[root(nm)] += 1
        print(f"total {sum(tot.values())/3:.1f} ms/step over 3 steps")
        for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:35]:
            print(f"{v/3:9.2f} ms/step x{n[k]//3:<5d} {k[:110]}")
