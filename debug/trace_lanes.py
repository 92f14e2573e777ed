"""Dump per-lane (pid/tid) event totals and the longest events from a
jax.profiler trace dir — no name filtering, for finding where wall time goes.

Usage: python debug/trace_lanes.py <trace_dir> [top_events]
"""

import collections
import glob
import gzip
import json
import sys


def main(tdir: str, top: int = 40):
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {tdir}"
    data, _ = rtd.xspace_to_tool_data(paths, "trace_viewer", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
    trace = json.loads(data)
    events = trace.get("traceEvents", [])
    names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev.get("pid")] = ev.get("args", {}).get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            names[(ev.get("pid"), ev.get("tid"))] = ev.get("args", {}).get("name", "")

    by_lane = collections.Counter()
    spans = {}
    big = []
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        lane = (ev.get("pid"), ev.get("tid"))
        by_lane[lane] += ev["dur"]
        t0, t1 = ev["ts"], ev["ts"] + ev["dur"]
        if lane in spans:
            spans[lane] = (min(spans[lane][0], t0), max(spans[lane][1], t1))
        else:
            spans[lane] = (t0, t1)
        big.append((ev["dur"], lane, ev.get("name", "")))

    print("=== lanes (sum of event durations / span) ===")
    for lane, tot in by_lane.most_common(25):
        pname = names.get(lane[0], "")
        tname = names.get(lane, "")
        s = spans[lane]
        print(f"  pid={lane[0]:<4} {pname[:28]:28s} tid={lane[1]:<6} "
              f"{tname[:30]:30s} sum={tot/1e3:10.3f} ms span={(s[1]-s[0])/1e3:10.3f} ms")

    print(f"=== top {top} events ===")
    big.sort(reverse=True)
    for dur, lane, name in big[:top]:
        pname = names.get(lane[0], "")
        tname = names.get(lane, "")
        print(f"  {dur/1e3:10.3f} ms  [{pname[:20]}/{tname[:24]}] {name[:90]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
