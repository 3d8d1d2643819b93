"""Parse the latest /tmp/jaxtrace xplane and print top device ops per step.
Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python parse_trace.py [steps]"""
import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
f = sorted(glob.glob("/tmp/jaxtrace/plugins/profile/*/*.xplane.pb"))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(f, "rb").read())

print(f"plane file: {f}")
for plane in xs.planes:
    print(f"  plane: {plane.name!r} lines={[l.name for l in plane.lines][:8]}")

tot = defaultdict(float)
cnt = defaultdict(int)
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    ev_md = plane.event_metadata
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_md[ev.metadata_id].name
            tot[name] += ev.duration_ps / 1e6
            cnt[name] += 1

rows = sorted(tot.items(), key=lambda kv: -kv[1])
print(f"{'us/step':>10} {'calls':>6}  op")
for name, us in rows[:50]:
    print(f"{us/steps:10.1f} {cnt[name]//steps:6d}  {name[:110]}")
print(f"{sum(tot.values())/steps:10.1f}       TOTAL device op time per step (us)")
