"""Genotype: the searchable cell architecture, as immutable data.

The reference encodes a searched cell as a namedtuple of numpy (edge, op)
rows (src/automl/genotypes_2d.py, mdenas_basicmodel.py:110-133). Here a
Genotype is a frozen pair of canonical (edge, op) tuples — hashable, so it
can participate directly in jit cache keys and checkpoint metadata.

``parse_genotype`` reproduces the reference's extraction rule
(mdenas_basicmodel.py:112-131): per step keep the top-2 in-edges ranked by
the max op probability excluding op 0 ("ignore none" — with the live 2-op
space this ranks by the conv_3x3 probability), then argmax the op on each
kept edge. We canonically sort kept edges by index (the reference leaves
them in rank order, which silently permutes op assignment downstream — a
quirk we fix, see SURVEY.md §"quirks").
"""

from __future__ import annotations

import dataclasses

import numpy as np

from rag_tpu.ops.cell import Gene, STEPS, canonicalize_gene


@dataclasses.dataclass(frozen=True)
class Genotype:
    """normal = 2D feature cell gene; reduce = 3D matching cell gene."""

    normal: Gene
    reduce: Gene


def _parse_gene(alphas: np.ndarray) -> Gene:
    """alphas: (num_edges, num_ops) softmax-normalized probabilities."""
    gene = []
    start, n = 0, 2
    for _ in range(STEPS):
        end = start + n
        edges = sorted(range(start, end), key=lambda x: -np.max(alphas[x, 1:]))
        for j in sorted(edges[:2]):
            gene.append((j, int(np.argmax(alphas[j]))))
        start = end
        n += 1
    return canonicalize_gene(gene)


def parse_genotype(p_normal: np.ndarray, p_reduce: np.ndarray) -> Genotype:
    """Extract a Genotype from search probabilities (each (9, 2))."""

    def _softmax(x):
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    return Genotype(
        normal=_parse_gene(_softmax(np.asarray(p_normal, np.float64))),
        reduce=_parse_gene(_softmax(np.asarray(p_reduce, np.float64))),
    )


def default_genotype() -> Genotype:
    """A fixed LEAStereo-flavoured genotype for the flagship deployed model
    (used when running without a search stage)."""
    gene = canonicalize_gene([(0, 1), (1, 1), (2, 1), (3, 1), (5, 1), (6, 1)])
    return Genotype(normal=gene, reduce=gene)
