"""Top INDIVIDUAL device ops from an existing jax.profiler trace dir.

Complements profile_sampling.py's prefix-aggregated view: prints the
top-N single HLO ops by total device time (summed over occurrences),
with occurrence counts — the level of detail needed to attribute the
native-res program's memory-bound fusions (PERF.md round-5).

Usage: python debug/trace_top_ops.py /tmp/ofd_profile_XXXX [--top 40]
"""
import argparse
import collections
import glob
import gzip
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tdir")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(f"{args.tdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {args.tdir}"
    data, _ = rtd.xspace_to_tool_data(paths, "trace_viewer", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
    trace = json.loads(data)
    events = trace.get("traceEvents", [])
    # lane (pid/tid) names so we can restrict to one device compute lane
    lanes = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            lanes[(ev.get("pid"), ev.get("tid"))] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            lanes[(ev.get("pid"), None)] = ev["args"].get("name", "")
    by_op = collections.Counter()
    count = collections.Counter()
    lane_of = {}
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        lane = lanes.get((ev.get("pid"), ev.get("tid")), "") or lanes.get(
            (ev.get("pid"), None), ""
        )
        # keep only XLA op lanes on the device (skip host + step lanes)
        if "XLA Op" not in lane and "Ops" not in lane:
            continue
        name = ev.get("name", "")
        if name.startswith("while"):
            continue  # wrapper event double-counts its children
        by_op[name] += ev["dur"]
        count[name] += 1
        lane_of[name] = lane
        total += ev["dur"]
    print(f"lanes seen: {sorted(set(lanes.values()))}")
    print(f"total leaf op time: {total / 1e3:.3f} ms")
    for op, dur in by_op.most_common(args.top):
        print(
            f"  {dur / 1e3:9.3f} ms {100 * dur / total:5.1f}%  x{count[op]:<4d}"
            f" {op[:110]}"
        )


if __name__ == "__main__":
    main()
