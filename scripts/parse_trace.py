"""Parse an xplane.pb and print per-line op-class breakdowns.

Usage: python scripts/parse_trace.py /tmp/rag_trace_bf16 [steps]
Async (copy/slice-start) events overlap compute, so they are reported on
their own lines — the serialized truth is the 'XLA Ops' line.
"""
import glob
import os
import sys


def classify(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
        return "pallas"
    if "copy" in n.split(".")[0] or n.startswith("%copy"):
        return "copy"
    if n.startswith(("%pad", "pad")):
        return "pad"
    if n.startswith(("%slice", "slice", "%dynamic-slice", "dynamic-slice",
                     "%dynamic-update-slice", "dynamic-update-slice")):
        return "slice"
    if n.startswith(("%transpose", "transpose")):
        return "transpose"
    if n.startswith(("%convolution", "convolution", "%dot", "dot")):
        return "matmul/conv"
    if "fusion" in n:
        return "fusion"
    if n.startswith(("%reduce", "reduce", "%all-reduce")):
        return "reduce"
    if n.startswith(("%convert", "convert", "%bitcast", "bitcast")):
        return "convert"
    return "other"


def main():
    outdir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    pbs = sorted(glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.xplane.pb")), key=os.path.getmtime)
    assert pbs, f"no xplane.pb under {outdir}"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())

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
