"""Variant: dump long names/args of big device events from the last trace."""
import glob, gzip, json, os
from collections import defaultdict
trace_dir = "/tmp/train_trace"
tj = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))[-1]
with gzip.open(tj, "rt") as f:
    data = json.load(f)
events = data["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "thread_name"}
dev_pids = {p for p, name in pid_names.items() if "TPU" in name or "/device" in name.lower()}
agg = defaultdict(lambda: [0.0, 0, None, None])
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        nm = e.get("name","?")
        a = agg[nm]
        a[0] += e.get("dur",0); a[1] += 1
        a[2] = tid_names.get((e["pid"], e["tid"]), e.get("tid"))
        a[3] = e.get("args", {})
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
for name, (dur, cnt, lane, args) in rows[:25]:
    la = {k: str(v)[:70] for k, v in (args or {}).items() if k in ("long_name","hlo_op","hlo_module","tf_op","name")}
    print(f"{dur/3e3:8.2f} ms x{cnt:3d} lane={lane!s:28s} {name[:40]!r} {la}")
