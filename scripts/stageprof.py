#!/usr/bin/env python3
"""Parse a Spark event log (JSON lines) into per-stage wall/task-time
attribution: stage id, name (call site), task count, summed task time,
submission->completion wall, shuffle bytes. Usage:
  stageprof.py <eventlog-file> [top_n]
"""
import json, sys, collections

path = sys.argv[1]
top = int(sys.argv[2]) if len(sys.argv) > 2 else 40

stages = {}
jobs = {}
with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time", 0)
            comp = si.get("Completion Time", 0)
            st = stages.setdefault(sid, dict(task_ms=0, shuf_read=0, shuf_write=0, input=0))
            st.update(
                name=si.get("Stage Name", ""),
                wall=(comp - sub) / 1000.0 if sub and comp else 0.0,
                tasks=si.get("Number of Tasks", 0),
                sub=sub, comp=comp,
                details=si.get("Details", "")[:400],
            )
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            tm = e.get("Task Metrics") or {}
            if not tm:
                acc = {a["Name"]: a.get("Update") for a in e.get("Task Info", {}).get("Accumulables", [])}
                g = lambda k: int(acc.get("internal.metrics." + k) or 0)
                tm = {"Executor Run Time": g("executorRunTime"),
                      "Shuffle Read Metrics": {"Remote Bytes Read": g("shuffle.read.remoteBytesRead"),
                                               "Local Bytes Read": g("shuffle.read.localBytesRead")},
                      "Shuffle Write Metrics": {"Shuffle Bytes Written": g("shuffle.write.bytesWritten")},
                      "Input Metrics": {"Bytes Read": g("input.bytesRead")}}
            st = stages.setdefault(sid, dict(name="?", wall=0, tasks=0, sub=0,
                comp=0, task_ms=0, shuf_read=0, shuf_write=0, input=0, details=""))
            st["task_ms"] += tm.get("Executor Run Time", 0)
            st["shuf_read"] += (tm.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0) + \
                               (tm.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
            st["shuf_write"] += (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
            st["input"] += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)

tot_task = sum(s["task_ms"] for s in stages.values())
print(f"stages={len(stages)} total_task_ms={tot_task}")
print(f"{'sid':>4} {'wall_s':>7} {'task_s':>8} {'tasks':>5} {'shW_mb':>6} {'shR_mb':>6} {'in_mb':>5}  name")
for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["task_ms"])[:top]:
    print(f"{sid:>4} {s['wall']:>7.2f} {s['task_ms']/1000.0:>8.2f} {s['tasks']:>5} "
          f"{s['shuf_write']>>20:>6} {s['shuf_read']>>20:>6} {s['input']>>20:>5}  {s['name'][:110]}")

# timeline gaps: time not covered by any running stage (driver-side)
iv = sorted((s["sub"], s["comp"]) for s in stages.values() if s["sub"])
if iv:
    covered = 0
    cur_s, cur_e = iv[0]
    for a, b in iv[1:]:
        if a > cur_e:
            covered += cur_e - cur_s
            cur_s, cur_e = a, b
        else:
            cur_e = max(cur_e, b)
    covered += cur_e - cur_s
    span = iv[-1][1] - iv[0][0]
    print(f"\nspan={span/1000:.2f}s stage-covered={covered/1000:.2f}s driver-gaps={(span-covered)/1000:.2f}s")
