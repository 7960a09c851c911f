"""Summarize a jax.profiler trace: top device ops by total time.

Usage: python tools/parse_trace.py /tmp/trace1 [N]

Reads the Perfetto/Chrome trace (trace.json.gz) produced by
jax.profiler.start_trace and aggregates TPU-track slice durations by op
name, printing the top-N plus a category rollup (matmul/conv/attention/
norm/elementwise/copy).
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(logdir):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        return json.load(f), path


CATEGORIES = [
    ("attention-kernel", re.compile(r"_fused_raw|_streaming_raw|"
                                    r"fused_attention|flash_attention", re.I)),
    ("pallas/custom-call", re.compile(r"pallas|custom-call", re.I)),
    ("conv", re.compile(r"convolution|conv", re.I)),
    ("matmul", re.compile(r"dot|einsum|gemm", re.I)),
    ("reduce/norm", re.compile(r"reduce|norm|variance|mean", re.I)),
    ("copy/layout", re.compile(r"copy|transpose|reshape|bitcast|concatenate|"
                               r"slice|pad|gather|dynamic", re.I)),
    ("elementwise", re.compile(r"fusion|add|multiply|subtract|divide|exp|"
                               r"tanh|logistic|maximum|select|convert|rsqrt",
                               re.I)),
]


def categorize(name):
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def main():
    logdir = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    data, path = load_trace(logdir)
    events = data["traceEvents"]

    # find TPU/device process ids (names like "/device:TPU:0" or "TPU:0")
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            n = e.get("args", {}).get("name", "")
            if re.search(r"TPU|device", n, re.I) and "host" not in n.lower():
                dev_pids.add(e["pid"])

    tot = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        tot[name] += e["dur"]
        cnt[name] += 1

    if not tot:
        raise SystemExit(f"no complete events (X) found in {path}")

    total_us = sum(tot.values())
    print(f"trace: {path}")
    print(f"total device-op time: {total_us/1e3:.1f} ms "
          f"({len(tot)} distinct ops)\n")
    print(f"{'us total':>12} {'%':>6} {'count':>6}  op")
    for name, us in tot.most_common(topn):
        print(f"{us:12.0f} {100*us/total_us:6.2f} {cnt[name]:6d}  "
              f"{name[:110]}")

    cats = collections.Counter()
    for name, us in tot.items():
        cats[categorize(name)] += us
    print("\ncategory rollup:")
    for cat, us in cats.most_common():
        print(f"  {cat:18s} {us/1e3:10.1f} ms  {100*us/total_us:5.1f}%")


if __name__ == "__main__":
    main()
