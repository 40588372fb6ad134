"""Clamped logistic/logit, the probability<->logit bridge of the whole codec.

Matches the reference contract (src/mixer/sigmoid.cpp:5-13): Logit clamps the
probability to [1e-4, 1-1e-4] before log-odds; Logistic is the plain sigmoid.
The final predictor output is additionally clamped to the same range
(src/predictor.cpp:370-375).

All math is float32. Encoder/decoder bit-exactness is guaranteed structurally
(one compiled program serves both modes), so we only need these to be
deterministic, not to match the C++ libm bit-for-bit.
"""
from __future__ import annotations

import jax.numpy as jnp

LOGIT_EPS = jnp.float32(1e-4)


def logistic(x) -> jnp.ndarray:
    x = jnp.asarray(x, dtype=jnp.float32)
    return jnp.float32(1.0) / (jnp.float32(1.0) + jnp.exp(-x))


def logit(p) -> jnp.ndarray:
    p = jnp.clip(jnp.asarray(p, dtype=jnp.float32), LOGIT_EPS, jnp.float32(1.0) - LOGIT_EPS)
    return jnp.log(p / (jnp.float32(1.0) - p))


def clamp_prob(p) -> jnp.ndarray:
    """Clamp the final mixed probability like Predictor::Predict."""
    return jnp.clip(jnp.asarray(p, dtype=jnp.float32), LOGIT_EPS, jnp.float32(1.0) - LOGIT_EPS)
