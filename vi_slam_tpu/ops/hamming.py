"""Hamming distance between packed 256-bit ORB descriptors.

Semantic reference: `FMatcher::DescriptorDistance`
(`/root/reference/src/geometry/fmatcher.cpp:2859` — bit-twiddling popcount
over 8 uint32 words).

TPU design: the pairwise distance matrix rides the MXU. With bit matrices
B1 (N,256), B2 (M,256) in {0,1}:

    hamming(i, j) = popcount(d1_i XOR d2_j)
                  = r1_i + r2_j - 2 * <b1_i, b2_j>

so one (N,256)x(256,M) matmul (bf16 inputs, f32 accumulate — exact for
0/1 values) replaces N*M*8 scalar popcounts. A scalar popcount path is
kept for small/irregular cases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.ops.orb import unpack_bits


def popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Branchless popcount of uint32 (fmatcher.cpp:2859 semantics)."""
    x = x - ((x >> np.uint32(1)) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + ((x >> np.uint32(2)) & np.uint32(0x33333333))
    x = (x + (x >> np.uint32(4))) & np.uint32(0x0F0F0F0F)
    return (x * np.uint32(0x01010101)) >> np.uint32(24)


def hamming_pairwise_packed(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming distance of aligned descriptor arrays
    (..., 8) uint32 -> (...,) int32."""
    return jnp.sum(popcount_u32(d1 ^ d2), axis=-1).astype(jnp.int32)


@jax.jit
def hamming_matrix(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Full (N, M) int32 Hamming distance matrix via one MXU matmul."""
    b1 = unpack_bits(d1)  # (N, 256) f32 {0,1}
    b2 = unpack_bits(d2)
    r1 = jnp.sum(b1, axis=-1)  # (N,)
    r2 = jnp.sum(b2, axis=-1)  # (M,)
    inner = jax.lax.dot_general(
        b1.astype(jnp.bfloat16),
        b2.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = r1[:, None] + r2[None, :] - 2.0 * inner
    return jnp.round(d).astype(jnp.int32)


@jax.jit
def hamming_matrix_bits(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Same as hamming_matrix but from pre-unpacked (N,256) bit matrices."""
    r1 = jnp.sum(b1, axis=-1)
    r2 = jnp.sum(b2, axis=-1)
    inner = jax.lax.dot_general(
        b1.astype(jnp.bfloat16),
        b2.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.round(r1[:, None] + r2[None, :] - 2.0 * inner).astype(jnp.int32)
