"""Shared xplane-trace helpers for trace_train_step.py / parse_trace.py.

One classify() so the two tools that back BASELINE.md's per-op-class
tables bucket identically (round-3 advisor finding: the duplicates
handled '%'-prefixed HLO names inconsistently).
"""


def classify(name: str) -> str:
    n = name.lower().lstrip("%")
    if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
        return "pallas"
    if n.split(".")[0].startswith("copy") or "copy-start" in n \
            or "copy-done" in n:
        return "copy"
    if n.startswith("pad"):
        return "pad"
    if n.startswith(("slice", "dynamic-slice", "dynamic-update-slice")):
        return "slice"
    if n.startswith("transpose"):
        return "transpose"
    if n.startswith(("convolution", "dot", "cudnn")):
        return "matmul/conv"
    if "fusion" in n or n.startswith(("loop_", "input_", "output_")):
        return "fusion"
    if n.startswith(("reduce", "all-reduce")):
        return "reduce"
    if n.startswith(("convert", "bitcast")):
        return "convert"
    return "other"


def load_xspace(outdir: str):
    """Latest xplane.pb under a profiler outdir, parsed."""
    import glob
    import os

    pbs = sorted(glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.xplane.pb")), key=os.path.getmtime)
    assert pbs, f"no xplane.pb under {outdir}"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs
