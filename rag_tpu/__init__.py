"""rag_tpu — a TPU-native continual stereo-depth engine.

A from-scratch JAX/XLA/Pallas framework providing the capability surface of
the RAG reference (chzhang18/RAG, CVPR 2022 / TPAMI 2024: "Reusable
Architecture Growth for Continual Stereo Matching"):

  * PSMNet/LEAStereo-lineage stereo pipeline: 2D Feature Net -> 4D cost
    volume -> 3D-conv Matching Net -> soft-argmin disparity regression
    (reference: src/models/rag_model.py).
  * MdeNAS probability-based cell search (reference: src/automl/).
  * Continual architecture growth with reuse-vs-new unit search
    (reference: src/approaches/rag.py).
  * Scene Router (paper feature, absent from the reference code).
  * Self-supervised (photometric) and monocular-depth variants
    (reference: src_self/, rag_depth/).

Design stance (TPU-first, not a port):
  * Architecture is data: genotypes / arch maps are immutable pytrees-of-
    static-python; parameters live in per-site candidate registries.
  * Everything inside jit is static-shaped; discrete search sampling happens
    on the host.
  * Hot ops (cost volume, disparity regression) have Pallas TPU kernels with
    pure-jnp reference implementations.
  * Scaling is mesh-native: jax.sharding + psum over ICI, no reference
    equivalent exists (the reference is single-GPU).
"""

__version__ = "0.1.0"
