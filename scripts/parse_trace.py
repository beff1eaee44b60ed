"""Parse an xplane.pb and print per-line op-class breakdowns.

Usage: python scripts/parse_trace.py /tmp/rag_trace_bf16 [steps]
Async (copy/slice-start) events overlap compute, so they are reported on
their own lines — the serialized truth is the 'XLA Ops' line.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_common import classify, load_xspace  # noqa: E402


def main():
    outdir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    xs = load_xspace(outdir)

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        print(f"\n##### plane: {plane.name}")
        ev_meta = plane.event_metadata
        for line in plane.lines:
            classes, ops, total = {}, {}, 0.0
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9
                cls = classify(name)
                classes[cls] = classes.get(cls, 0.0) + dur
                ops[name] = ops.get(name, 0.0) + dur
                total += dur
            if total < 0.01:
                continue
            print(f"\n== line '{line.name}': {total / steps:.2f} ms/step ==")
            for cls, ms in sorted(classes.items(), key=lambda kv: -kv[1]):
                print(f"  {cls:12s} {ms / steps:8.3f} ms "
                      f"({100 * ms / total:5.1f}%)")
            for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:12]:
                print(f"     {ms / steps:8.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
