"""
Minimal JAX xplane trace summarizer: sums device op durations per op name.

The tensorboard_plugin_profile converter in this image is broken against
the installed TF (missing xspace_to_tools_data / stale _pb2 descriptors),
so this parses the .xplane.pb wire format directly — only the fields the
summary needs (XSpace.planes -> XPlane{name, lines, event_metadata} ->
XLine.events -> XEvent{metadata_id, duration_ps}).

Usage: python benchmarks/trace_sum.py <trace.xplane.pb> [iters] [top_n]
"""

import collections
import struct
import sys


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over one message's bytes."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def summarize(path, iters=1, top_n=60):
    space = open(path, "rb").read()
    out = []
    for fn, _, plane_b in _fields(space):
        if fn != 1:  # XSpace.planes
            continue
        name = ""
        lines = []
        ev_meta = {}
        for pf, _, pv in _fields(plane_b):
            if pf == 2:
                name = pv.decode()
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata>
                k = v = None
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:
                        for ef, _, ev in _fields(mv):
                            if ef == 1:
                                k = ev
                            elif ef == 2:
                                v = ev.decode()
                if k is not None:
                    ev_meta[k] = v or "?"
        agg = collections.Counter()
        cnt = collections.Counter()
        for line_b in lines:
            lname = ""
            events = []
            for lf, _, lv in _fields(line_b):
                if lf == 2:
                    lname = lv.decode()
                elif lf == 4:
                    events.append(lv)
            if "XLA Ops" not in lname:
                continue
            for ev_b in events:
                mid = dur = 0
                for ef, _, ev in _fields(ev_b):
                    if ef == 1:
                        mid = ev
                    elif ef == 3:
                        dur = ev
                nm = ev_meta.get(mid, "?")
                agg[nm] += dur / 1e9 / iters  # ps -> ms, per step
                cnt[nm] += 1
        if agg:
            out.append((name, agg, cnt))
    return out


def main():
    path = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    for name, agg, cnt in summarize(path, iters, top_n):
        tot = sum(agg.values())
        print(f"== plane {name}: {tot:.2f} ms/step, {sum(cnt.values())//iters} ops")
        for nm, ms in agg.most_common(top_n):
            print(f"  {ms:8.3f} ms x{cnt[nm]//max(iters,1):<4} {nm[:105]}")


if __name__ == "__main__":
    main()
