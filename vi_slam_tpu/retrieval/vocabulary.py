"""Bag-of-binary-words vocabulary — the DBoW3 equivalent, TPU-native.

Semantic reference: DBoW3 hierarchical k-means vocabulary
(`/root/reference/thirdparty/DBoW3/DBoW3/src/Vocabulary.h:455-461` —
branching m_k x depth m_L tree; `transform(features) -> BowVector,
FeatureVector` :138-165; TF-IDF weighting + L1 scoring :42,171).

TPU redesign (SURVEY §2.2 "DBoW3" row): the tree is a flat centroid
matrix with static per-level offsets. `transform` descends the tree with
one batched Hamming-to-children computation per level — a gather plus an
(N, k, 256) contraction, all static shapes. Training is constrained
k-means run one level at a time over *all* nodes of the level
simultaneously (assignment restricted to the k children of each
descriptor's parent), so every iteration is a single jitted program:
distance + argmin + `segment_sum` bit-majority update. No per-node host
recursion.

Scoring uses L1-normalized TF-IDF vectors; for non-negative L1-normalized
v, w:  ||v - w||_1 = 2 - 2 * sum_i min(v_i, w_i), so the DBoW3 L1 score
s = 1 - 0.5 ||v - w||_1 equals sum_i min(v_i, w_i) (ScoringObject.cpp
semantics).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.ops.orb import unpack_bits


class Vocabulary(NamedTuple):
    """Flat hierarchical vocabulary.

    node_bits: (n_nodes, 256) float32 {0,1} — centroids of every tree node,
        all levels concatenated; level l occupies
        [offset[l], offset[l] + k^(l+1)).
    idf: (n_words,) float32 — inverse document frequency per leaf word.
    k: branching factor; levels: tree depth (n_words = k^levels).
    """

    node_bits: jnp.ndarray
    idf: jnp.ndarray
    k: int
    levels: int

    @property
    def n_words(self) -> int:
        return self.k ** self.levels

    @property
    def offsets(self) -> Tuple[int, ...]:
        off, total = [], 0
        for l in range(self.levels):
            off.append(total)
            total += self.k ** (l + 1)
        return tuple(off)


def _n_nodes(k: int, levels: int) -> int:
    return sum(k ** (l + 1) for l in range(levels))


# ---------------------------------------------------------------------------
# transform: descriptors -> leaf word ids (+ mid-level node for matching)
# ---------------------------------------------------------------------------


def _child_distances(
    bits: jnp.ndarray, node_bits: jnp.ndarray, child_base: jnp.ndarray, k: int
) -> jnp.ndarray:
    """Hamming distance from each descriptor to its k candidate children.

    bits: (N, 256) {0,1}; child_base: (N,) int32 global index of child 0.
    Returns (N, k) float32.
    """
    idx = child_base[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    cand = node_bits[idx]  # (N, k, 256)
    r_b = jnp.sum(bits, axis=-1)  # (N,)
    r_c = jnp.sum(cand, axis=-1)  # (N, k)
    inner = jnp.einsum(
        "nd,nkd->nk",
        bits.astype(jnp.bfloat16),
        cand.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return r_b[:, None] + r_c - 2.0 * inner


@partial(jax.jit, static_argnames=("k", "levels", "node_level"))
def _transform_bits(
    bits: jnp.ndarray,
    node_bits: jnp.ndarray,
    k: int,
    levels: int,
    node_level: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Descend the tree. Returns (words (N,), nodes (N,)) int32 — leaf word
    id and the id of the ancestor at `node_level` (FeatureVector levelsup
    equivalent, Vocabulary.h:transform)."""
    offsets, total = [], 0
    for l in range(levels):
        offsets.append(total)
        total += k ** (l + 1)
    n = bits.shape[0]
    local = jnp.zeros((n,), jnp.int32)
    node_id = jnp.zeros((n,), jnp.int32)
    for l in range(levels):
        child_base = offsets[l] + local * k
        d = _child_distances(bits, node_bits, child_base, k)
        j = jnp.argmin(d, axis=-1).astype(jnp.int32)
        local = local * k + j
        if l == node_level:
            node_id = local
    return local, node_id


def transform(
    vocab: Vocabulary, desc: jnp.ndarray, node_level: Optional[int] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed descriptors (N, 8) uint32 -> (words (N,), nodes (N,)).

    node_level defaults to levels-3 (ORB-SLAM uses 4 levels up from the
    leaves of a 6-level tree; for shallower trees we keep ~k^2..k^3 groups,
    enough to prune matching the way SearchByBoW does)."""
    if node_level is None:
        node_level = max(vocab.levels - 3, 0)
    bits = unpack_bits(desc)
    return _transform_bits(bits, vocab.node_bits, vocab.k, vocab.levels, node_level)


# ---------------------------------------------------------------------------
# BoW vectors + scoring
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_words",))
def bow_vectors(
    words: jnp.ndarray, valid: jnp.ndarray, idf: jnp.ndarray, n_words: int
) -> jnp.ndarray:
    """Words (..., N) + validity -> L1-normalized TF-IDF vectors (..., W).

    Mirrors Vocabulary::transform's accumulation + normalization
    (DBoW3 L1_NORM)."""
    w = jnp.where(valid, words, 0)
    tf = jax.vmap(
        lambda ww, vv: jax.ops.segment_sum(
            jnp.where(vv, 1.0, 0.0), ww, num_segments=n_words
        )
    )(w.reshape(-1, w.shape[-1]), valid.reshape(-1, valid.shape[-1]))
    v = tf.reshape(*words.shape[:-1], n_words) * idf
    norm = jnp.sum(jnp.abs(v), axis=-1, keepdims=True)
    return v / jnp.maximum(norm, 1e-12)


@jax.jit
def score_l1(query: jnp.ndarray, refs: jnp.ndarray) -> jnp.ndarray:
    """DBoW3 L1 score between a query vector (W,) and refs (K, W): larger is
    more similar, 1.0 = identical. s = sum min(v, w)."""
    return jnp.sum(jnp.minimum(query[None, :], refs), axis=-1)


# ---------------------------------------------------------------------------
# training: level-synchronous constrained k-means
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k", "offset", "n_level_nodes"))
def _level_kmeans_iter(
    bits: jnp.ndarray,
    node_bits: jnp.ndarray,
    parent: jnp.ndarray,
    k: int,
    offset: int,
    n_level_nodes: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One constrained-k-means iteration over all nodes of one level.

    parent: (N,) local id of each descriptor's parent (level l-1), so the
    candidate children are offset + parent*k ... + k-1.
    Returns (new node_bits, assignment local ids (N,)).
    """
    child_base = offset + parent * k
    d = _child_distances(bits, node_bits, child_base, k)
    j = jnp.argmin(d, axis=-1).astype(jnp.int32)
    assign = parent * k + j  # local id within this level
    # bit-majority update per node
    ones = jax.ops.segment_sum(bits, assign, num_segments=n_level_nodes)
    cnt = jax.ops.segment_sum(
        jnp.ones((bits.shape[0],), jnp.float32), assign, num_segments=n_level_nodes
    )
    maj = (ones * 2.0 > cnt[:, None]).astype(jnp.float32)
    # keep previous centroid for empty nodes
    prev = jax.lax.dynamic_slice_in_dim(node_bits, offset, n_level_nodes, axis=0)
    new = jnp.where((cnt > 0)[:, None], maj, prev)
    node_bits = jax.lax.dynamic_update_slice_in_dim(node_bits, new, offset, axis=0)
    return node_bits, assign


def train_vocabulary(
    desc: np.ndarray,
    k: int = 10,
    levels: int = 4,
    iters: int = 8,
    image_ids: Optional[np.ndarray] = None,
    seed: int = 0,
) -> Vocabulary:
    """Train a hierarchical binary vocabulary (createVoc.cpp capability,
    `/root/reference/tools/createVoc/createVoc.cpp`).

    desc: (N, 8) uint32 packed descriptors from training images.
    image_ids: optional (N,) int — which image each descriptor came from,
        used for IDF; identity weighting if absent.
    """
    rng = np.random.default_rng(seed)
    bits = np.array(unpack_bits(jnp.asarray(desc)))  # writable host copy
    n = bits.shape[0]
    node_bits = np.zeros((_n_nodes(k, levels), 256), np.float32)
    offsets, total = [], 0
    for l in range(levels):
        offsets.append(total)
        total += k ** (l + 1)

    bits_d = jnp.asarray(bits)
    parent = np.zeros((n,), np.int32)
    for l in range(levels):
        n_level = k ** (l + 1)
        # init: child j of parent p <- a random descriptor of p's partition
        order = rng.permutation(n)
        init = node_bits[offsets[l] : offsets[l] + n_level]
        # fallback: random bits for nodes with no parent descriptors
        init[:] = (rng.random((n_level, 256)) < 0.5).astype(np.float32)
        fill = np.zeros(n_level, bool)
        for idx in order:
            p = parent[idx]
            free = np.flatnonzero(~fill[p * k : (p + 1) * k])
            if free.size:
                init[p * k + free[0]] = bits[idx]
                fill[p * k + free[0]] = True
        node_bits[offsets[l] : offsets[l] + n_level] = init
        nb = jnp.asarray(node_bits)
        par_d = jnp.asarray(parent)
        assign = None
        for _ in range(iters):
            nb, assign = _level_kmeans_iter(
                bits_d, nb, par_d, k, offsets[l], n_level
            )
        node_bits = np.array(nb)  # writable host copy
        parent = np.asarray(assign)

    words = parent  # leaf assignment after the last level
    n_words = k ** levels
    if image_ids is not None:
        n_imgs = int(image_ids.max()) + 1
        seen = np.zeros((n_words,), np.float64)
        for im in range(n_imgs):
            ws = np.unique(words[image_ids == im])
            seen[ws] += 1.0
        idf = np.log(n_imgs / np.maximum(seen, 1.0)).astype(np.float32)
        idf = np.maximum(idf, 1e-3)
    else:
        idf = np.ones((n_words,), np.float32)
    return Vocabulary(
        node_bits=jnp.asarray(node_bits), idf=jnp.asarray(idf), k=k, levels=levels
    )


def save_vocabulary(path: str, vocab: Vocabulary) -> None:
    np.savez_compressed(
        path,
        node_bits=np.packbits(
            np.asarray(vocab.node_bits).astype(np.uint8), axis=-1
        ),
        idf=np.asarray(vocab.idf),
        k=vocab.k,
        levels=vocab.levels,
    )


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    bits = np.unpackbits(z["node_bits"], axis=-1).astype(np.float32)
    return Vocabulary(
        node_bits=jnp.asarray(bits),
        idf=jnp.asarray(z["idf"]),
        k=int(z["k"]),
        levels=int(z["levels"]),
    )
