"""Reference-checkpoint import + architecture parity (VERDICT r3 #4).

The reference publishes exactly one set of weights —
rag_depth/logs/checkpoint_task{0..3}.ckpt (legacy torch pickles of
state_dicts, saved at rag_depth/src/run.py:204-206) — and no load path.
These tests pin that our rebuilt architecture is layer-for-layer
compatible with that artifact:

  * the torch-free legacy reader reproduces torch.load bit-for-bit;
  * every tensor of every task's checkpoint lands on a registry site with
    the right shape (import_depth_checkpoint asserts unused == []);
  * a ConvBR block built from imported weights matches the torch
    forward numerically (layout mapping OIHW -> HWIO + BN semantics);
  * the imported task-0 net runs depth_forward end to end with outputs
    in [0, max_depth], and growth is visible across the four artifacts
    (candidate counts / param totals strictly grow).

Documented structural findings (see rag_tpu/compat/torch_import.py):
genes' edge connectivity and later tasks' archis are NOT in the artifact
(the reference checkpoint cannot rebuild the reference network); dormant
BN tensors exist for bn=False blocks.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/rag_depth/logs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkpoints not mounted")


@pytest.fixture(scope="module")
def sd0():
    from rag_tpu.compat.torch_import import load_legacy_torch

    return load_legacy_torch(os.path.join(REF, "checkpoint_task0.ckpt"))


@pytest.fixture(scope="module")
def net0():
    from rag_tpu.compat.torch_import import import_depth_checkpoint

    return import_depth_checkpoint(os.path.join(REF, "checkpoint_task0.ckpt"))


def test_legacy_reader_matches_torch(sd0):
    torch = pytest.importorskip("torch")
    ref = torch.load(os.path.join(REF, "checkpoint_task0.ckpt"),
                     map_location="cpu", weights_only=False)
    ours = sd0["model"]
    theirs = ref["model"]
    assert set(ours) == set(theirs)
    for k in list(ours)[::17] + ["depth_head.conv1.weight",
                                 "cells_3d.7.0._ops.0.conv.weight"]:
        a = np.asarray(ours[k])
        b = theirs[k].numpy()
        assert a.shape == b.shape and a.dtype == b.dtype, k
        assert np.array_equal(a, b), k


def test_every_tensor_lands(net0):
    net, info = net0
    assert info["unused"] == []
    assert info["task"] == 0
    assert all(n == 1 for n in info["candidates"].values())
    # param total equals the artifact's conv+bn+head tensors (dormant BN
    # excluded): growth-visible baseline for the later tasks
    assert 0.04 < net.size_m() < 0.07


def test_convbr_block_matches_torch_forward(sd0):
    torch = pytest.importorskip("torch")
    sd = sd0["model"]
    from rag_tpu.ops.convbr import ConvBRSpec, apply_convbr

    # rebuild stem2d0 candidate 0 both ways
    from rag_tpu.compat.torch_import import _convbr_from

    spec = ConvBRSpec(2, 3, 6, 3, 1)
    params, stats = _convbr_from(sd, "stem2d0.0", spec, set())
    x = np.random.default_rng(0).standard_normal((2, 24, 48, 3)).astype(
        np.float32)
    y, _ = apply_convbr(spec, params, stats, jnp.asarray(x), train=False)

    conv = torch.nn.Conv2d(3, 6, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.asarray(sd["stem2d0.0.conv.weight"])))
        bn.weight.copy_(torch.from_numpy(np.asarray(sd["stem2d0.0.bn.weight"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(sd["stem2d0.0.bn.bias"])))
        bn.running_mean.copy_(
            torch.from_numpy(np.asarray(sd["stem2d0.0.bn.running_mean"])))
        bn.running_var.copy_(
            torch.from_numpy(np.asarray(sd["stem2d0.0.bn.running_var"])))
    bn.eval()
    with torch.no_grad():
        yt = torch.relu(bn(conv(torch.from_numpy(x).permute(0, 3, 1, 2))))
    yt = yt.permute(0, 2, 3, 1).numpy()
    assert np.allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)


def test_imported_net_forward_and_eval(net0):
    net, _ = net0
    from rag_tpu.models.depth import MAX_DEPTH, depth_forward

    specs, params, stats = net.path(net.archis[0])
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 48, 96, 3))
    depth, _ = depth_forward(specs, params, stats, img)
    assert depth.shape == (1, 48, 96)
    d = np.asarray(depth)
    assert np.all(np.isfinite(d)) and d.min() >= 0 and d.max() <= MAX_DEPTH

    from rag_tpu.metrics.depth import depth_metrics
    from rag_tpu.train.trainer import make_depth_eval_step

    step = make_depth_eval_step(specs)
    gt = jax.random.uniform(jax.random.PRNGKey(1), (1, 48, 96),
                            minval=1.0, maxval=60.0)
    scalars = step(params, stats, img, gt)
    assert all(np.isfinite(float(v)) for v in scalars.values())


@pytest.mark.slow
def test_growth_visible_across_artifacts():
    from rag_tpu.compat.torch_import import import_depth_checkpoint

    sizes, cands = [], []
    for t in range(4):
        net, info = import_depth_checkpoint(
            os.path.join(REF, f"checkpoint_task{t}.ckpt"))
        assert info["task"] == t and info["unused"] == []
        sizes.append(net.size_m())
        cands.append(sum(info["candidates"].values()))
        for h in ("last_3_3d", "last_6_3d", "last_12_3d"):
            assert len(net.heads[h]) == t + 1
    assert all(a < b for a, b in zip(sizes, sizes[1:])), sizes
    assert all(a <= b for a, b in zip(cands, cands[1:])), cands


def test_malicious_header_pickle_rejected(tmp_path):
    """ADVICE r4 (high): the magic/protocol/sys_info/storage-keys pickles
    used to go through plain pickle.load — a GLOBAL opcode there executed
    code before the restricted unpickler ever ran. Every pickle in the
    stream is now restricted: a crafted header must raise, not import."""
    import pickle

    from rag_tpu.compat.torch_import import load_legacy_torch

    evil = tmp_path / "evil.ckpt"
    # hand-assembled pickle: GLOBAL os.system, short string arg, REDUCE
    evil.write_bytes(b"cos\nsystem\n(S'true'\ntR.")
    with pytest.raises(pickle.UnpicklingError, match="disallowed symbol"):
        load_legacy_torch(str(evil))


def test_out_of_bounds_view_rejected():
    """ADVICE r4 (high): offset/size/stride from the artifact are untrusted
    — geometry reaching past the storage must raise, not read OOB."""
    from rag_tpu.compat.torch_import import _LazyTensor

    storage = {"k": np.arange(16, dtype="<f4").tobytes()}
    dt = np.dtype("<f4")
    # in-bounds view works
    ok = _LazyTensor("k", dt, 2, (2, 3), (3, 1)).materialize(storage)
    np.testing.assert_array_equal(ok, [[2, 3, 4], [5, 6, 7]])
    with pytest.raises(ValueError, match="reaches element"):
        _LazyTensor("k", dt, 2, (4, 4), (4, 1)).materialize(storage)
    with pytest.raises(ValueError, match="offset"):
        _LazyTensor("k", dt, 99, (2, 2), (2, 1)).materialize(storage)
    with pytest.raises(ValueError, match="bad view geometry"):
        _LazyTensor("k", dt, 0, (4,), (-1,)).materialize(storage)
