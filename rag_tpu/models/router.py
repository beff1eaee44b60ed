"""Scene Router: per-frame path selection at inference time.

The RAG paper describes a Scene Router that predicts which task-path to run
from the input image; the released reference code does NOT ship it —
``Network.forward`` carries a dormant ``path=None`` hook
(src/models/rag_model.py:369, :296-297) and evaluation always receives the
ground-truth task id (src/run.py:180). This module is the new build of that
missing capability.

Design: a small convolutional scene classifier over the LEFT image (global
average pooled), trained on the frames of each scene encountered so far with
a cross-entropy objective. At inference, ``route`` returns the task id whose
path the growable network should execute; ``routed_eval`` wires it to the
per-task compiled executables. The classifier is deliberately tiny (the
router must cost ~nothing next to the stereo pipeline) and runs in the same
jit.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def init_router(key, num_tasks: int, width: int = 16):
    """3-layer strided conv trunk + linear head over GAP features."""
    k = jax.random.split(key, 4)

    def conv(kk, cin, cout):
        std = np.sqrt(2.0 / (cout * 9))
        return jax.random.normal(kk, (3, 3, cin, cout)) * std

    return {
        "c0": conv(k[0], 3, width),
        "c1": conv(k[1], width, width * 2),
        "c2": conv(k[2], width * 2, width * 4),
        # head over [global mean ; global std] of the trunk features: the
        # std half separates appearance styles that differ in VARIANCE
        # (e.g. rain noise) which mean-pooling alone washes out
        "w": jax.random.normal(k[3], (width * 8, num_tasks)) * 0.01,
        "b": jnp.zeros((num_tasks,)),
    }


def router_logits(params, image):
    """image: (B,H,W,3) -> (B,num_tasks)."""
    x = image
    for name in ("c0", "c1", "c2"):
        x = jax.lax.conv_general_dilated(
            x, params[name], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x)
    mean = jnp.mean(x, axis=(1, 2))
    std = jnp.sqrt(jnp.maximum(
        jnp.mean(jnp.square(x), axis=(1, 2)) - jnp.square(mean), 0.0))
    feat = jnp.concatenate([mean, std], axis=-1)
    return feat @ params["w"] + params["b"]


def route(params, image) -> jnp.ndarray:
    """(B,) predicted task ids."""
    return jnp.argmax(router_logits(params, image), axis=-1)


def make_router_train_step(optimizer):
    @jax.jit
    def step(params, opt_state, images, labels):
        def loss_fn(p):
            logits = router_logits(p, images)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


class SceneRouter:
    """Host-side trainer/predictor for the scene classifier."""

    def __init__(self, num_tasks: int, seed: int = 0, lr: float = 1e-3,
                 input_key: str = "left"):
        self.num_tasks = num_tasks
        self.input_key = input_key  # "left" (stereo) / "image" (depth)
        self.params = init_router(jax.random.PRNGKey(seed), num_tasks)
        self.optimizer = optax.adam(lr)
        self.opt_state = self.optimizer.init(self.params)
        self._step = make_router_train_step(self.optimizer)

    def train(self, datasets, epochs: int = 3, batch: int = 8, log=None):
        """datasets: one per scene (index = label). Balanced round-robin."""
        for epoch in range(epochs):
            batch_eff = max(1, min(batch, min(len(d) for d in datasets)))
            iters = [d.batches(batch_eff, True, seed=epoch) for d in datasets]
            done = [False] * len(iters)
            loss = None
            while not all(done):
                for t, it in enumerate(iters):
                    if done[t]:
                        continue
                    try:
                        b = next(it)
                    except StopIteration:
                        done[t] = True
                        continue
                    frames = b[self.input_key]
                    labels = jnp.full((frames.shape[0],), t, jnp.int32)
                    self.params, self.opt_state, loss = self._step(
                        self.params, self.opt_state, frames, labels)
            if log and loss is not None:
                log(f"[router] epoch {epoch} loss {float(loss):.4f}")

    def predict(self, images) -> np.ndarray:
        return np.asarray(route(self.params, images))

    # -- persistence (round 2: router state joins the continual checkpoint;
    #    round 1 rebuilt a fresh random router in --eval-only, making routed
    #    cross-domain eval meaningless on a reloaded checkpoint) -----------

    def state_arrays(self) -> dict:
        """Flat {key: np.ndarray} of params + optimizer state."""
        flat, _ = jax.tree_util.tree_flatten((self.params, self.opt_state))
        return {f"router_leaf_{i}": np.asarray(l) for i, l in enumerate(flat)}

    def load_arrays(self, arrays: dict):
        """Inverse of state_arrays (self must have the same num_tasks)."""
        _, treedef = jax.tree_util.tree_flatten((self.params, self.opt_state))
        n = len([k for k in arrays if k.startswith("router_leaf_")])
        leaves = [jnp.asarray(arrays[f"router_leaf_{i}"]) for i in range(n)]
        self.params, self.opt_state = jax.tree_util.tree_unflatten(
            treedef, leaves)

    def accuracy(self, datasets, batch: int = 8) -> float:
        correct = total = 0
        for t, d in enumerate(datasets):
            for b in d.batches(batch, False, seed=0, drop_last=False):
                pred = self.predict(b[self.input_key])
                correct += int((pred == t).sum())
                total += len(pred)
        return correct / max(total, 1)
