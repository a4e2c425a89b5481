"""Per-layer device-time attribution for a jax.profiler trace.

The axon relay streams real TPU op events (pid of /device:TPU:0 in the
trace.json.gz). Fusion names alone ("fusion.521") are opaque; the compiled
HLO's metadata carries op_name="jit(fn)/.../l3/conv/..." per fusion. This
tool joins the two into the table that drove the round-3 s2d-region work.

Usage:
  1. capture: with yolov3_tpu.utils.profiling.trace(dir): fn(...); fetch
  2. dump HLO: open(hlo_path,"w").write(jax.jit(fn).lower(*args).compile().as_text())
  3. python scripts/trace_attr.py <trace.json.gz|profile dir> <hlo.txt>
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys


def attribute(trace_path, hlo_path, top=25):
    hlo = open(hlo_path).read()
    name2op = {}
    for m in re.finditer(r'%(\S+) = \S+ fusion\(.*?op_name="jit\(\w+\)/([^"]+)"', hlo):
        name2op[m.group(1)] = m.group(2)
    if trace_path.endswith(".gz"):
        files = [trace_path]
    else:
        files = sorted(glob.glob(f"{trace_path}/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1]) as fh:
        d = json.load(fh)
    dev_pids = {e["pid"] for e in d["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    per = collections.Counter()
    unattr = collections.Counter()
    total = 0.0
    for e in d["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if e["name"].startswith("jit_"):
            total = max(total, e["dur"])
            continue
        op = name2op.get(e["name"])
        if op:
            mm = re.search(r"_run_layers/(l[\d_]+(?:/cv\d)?)", op)
            per[mm.group(1) if mm else op[:60]] += e["dur"]
        else:
            unattr[re.sub(r"[.\d]+$", "", e["name"])] += e["dur"]
    print(f"program total {total / 1e3:.2f} ms | attributed {sum(per.values()) / 1e3:.2f}"
          f" | unattributed {sum(unattr.values()) / 1e3:.2f}")
    for k, v in sorted(per.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v / 1e3:>9.2f} ms  {k}")
    for k, v in unattr.most_common(5):
        if v > 100:
            print(f"{v / 1e3:>9.2f} ms  [{k}]")
    return per, unattr, total


if __name__ == "__main__":
    attribute(sys.argv[1], sys.argv[2], top=int(sys.argv[3]) if len(sys.argv) > 3 else 25)
