"""Robust loss reweighting for iteratively-reweighted Gauss-Newton.

Semantic reference: g2o's RobustKernelHuber as used throughout
`/root/reference/src/optimization/optimizer.cpp` (deltaMono = sqrt(5.991),
deltaStereo = sqrt(7.815)).
"""

from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO = 5.991  # 95% chi2, 2 dof
CHI2_STEREO = 7.815  # 95% chi2, 3 dof


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber loss given squared error chi2 = e^T Ω e.

    w = 1 for chi2 <= delta^2, delta/sqrt(chi2) beyond."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-18))
    delta = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, jnp.ones_like(e), delta / e)


def huber_rho(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """Huber cost rho(chi2) (for LM accept tests)."""
    delta = jnp.sqrt(delta2)
    e = jnp.sqrt(jnp.maximum(chi2, 0.0))
    return jnp.where(chi2 <= delta2, chi2, 2.0 * delta * e - delta2)
