"""Aggregate latest xplane trace by op-name family."""
import glob, re, sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

f = sorted(glob.glob("/tmp/jaxtrace/plugins/profile/*/*.xplane.pb"))[-1]
xs = xplane_pb2.XSpace(); xs.ParseFromString(open(f, "rb").read())
tot, cnt = defaultdict(float), defaultdict(int)
for plane in xs.planes:
    if "TPU" not in plane.name: continue
    md = plane.event_metadata
    for line in plane.lines:
        if line.name != "XLA Ops": continue
        for ev in line.events:
            name = md[ev.metadata_id].name
            fam = re.sub(r"[.\d]+$", "", name.split(" = ")[0].lstrip("%"))
            tot[fam] += ev.duration_ps / 1e6
            cnt[fam] += 1
rows = sorted(tot.items(), key=lambda kv: -kv[1])
print(f"{'total_ms':>10} {'calls':>7}  family")
for name, us in rows[:25]:
    print(f"{us/1e3:10.1f} {cnt[name]:7d}  {name[:90]}")
print(f"{sum(tot.values())/1e3:10.1f}       TOTAL (ms)")
