"""Selective matmul precision control.

TPU f32 matmuls default to fast low-precision passes; geometry/solver code
(world-scale coordinates, normal equations) needs true f32, while the
image-processing and Hamming paths are precision-tolerant (and explicitly
bf16 where it counts). Wrap only the sensitive functions instead of
setting the global flag — the global "highest" costs ~6x on every conv.
"""

from __future__ import annotations

import functools

import jax


def precise(fn):
    """Trace `fn` under full-f32 matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper
