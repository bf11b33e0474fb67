"""Parse /tmp/jax_trace xplane.pb: sum device-plane event self-times by
op name, print the top entries."""
import glob
import re
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = sorted(glob.glob("/tmp/jax_trace/**/*.xplane.pb", recursive=True))
space = xplane_pb2.XSpace()
with open(xs[-1], "rb") as f:
    space.ParseFromString(f.read())

for plane in space.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for line in plane.lines:
        for ev in line.events:
            name = meta.get(ev.metadata_id, str(ev.metadata_id))
            tot[name] += ev.duration_ps / 1e9  # ms
            cnt[name] += 1
    print(f"== plane {plane.name}: {sum(tot.values()):.1f} ms total ==")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{ms:9.2f} ms  x{cnt[name]:<4d} {name[:110]}")
    print()
