"""Profile the jitted train step and print a device-time summary by op
class — the reproducible version of the round-2 ad-hoc trace analysis
(CLAUDE.md "Known perf facts": per-call dispatch through the tunnel makes
wall-clock microbenchmarks meaningless; device traces are the ground
truth, but attributed per-op times overstate savings because XLA hides
much of it behind async copies — use this for WHERE-time-goes maps, and
controlled end-to-end A/B for decisions).

Usage: python tools/profile_train_step.py [batch] [preset] [trace_dir] [accum]

`accum` (or ICEK_ACCUM) profiles the in-graph gradient-accumulation step
at that microbatch count — the round-5 tool for attributing the
per-microbatch fixed costs that make accum>2 flat-to-worse on the
knowledge preset (VERDICT r4 #4).  Pass "auto" for the shipped default.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_trace(trace_dir):
    paths = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    return max(paths, key=os.path.getmtime)


_SUFFIX = re.compile(r"[.\-_]?\d+$")


def op_class(name: str) -> str:
    """Collapse 'fusion.123' / 'dot.45' / '%reduce.7' to the op class."""
    name = name.split("/")[-1].lstrip("%")
    prev = None
    while prev != name:
        prev, name = name, _SUFFIX.sub("", name)
    return name or "(unnamed)"


def summarize(trace_path, steps):
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {
        pid for pid, name in pid_names.items()
        if any(k in name for k in ("TPU", "Chip", "/device", "XLA Op"))
    }
    groups = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        # keep leaf op events only: XLA op rows carry long_name/hlo args
        args = e.get("args") or {}
        if device_pids and not (
            "long_name" in args or "hlo_op" in args or "hlo" in args
        ):
            continue
        ms = e["dur"] / 1000.0
        g = groups[op_class(e.get("name", ""))]
        g[0] += ms
        g[1] += 1
        total += ms
    rows = sorted(groups.items(), key=lambda kv: -kv[1][0])
    print(f"device total: {total:.2f} ms over {steps} steps "
          f"({total / max(steps, 1):.2f} ms/step attributed)")
    print(f"{'op class':<40}{'total ms':>10}{'ms/step':>10}{'count':>8}")
    for name, (ms, count) in rows[:30]:
        print(f"{name:<40}{ms:>10.2f}{ms / max(steps, 1):>10.3f}{count:>8}")
    return total, rows


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    preset = sys.argv[2] if len(sys.argv) > 2 else "georic"
    trace_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/icek_train_trace"
    if len(sys.argv) > 4:
        os.environ["ICEK_ACCUM"] = sys.argv[4]
    from benchmarks.train_throughput import measure_icek

    steps = 10
    result = measure_icek(batch=batch, iters=20, preset=preset,
                          profile_dir=trace_dir)
    print(json.dumps(result))
    summarize(find_trace(trace_dir), steps)


if __name__ == "__main__":
    main()
