"""Activation functions.

The reference ships a numerically-stable sigmoid with gradient
(activation_function.hpp:12-18, sigmoid.cpp:15-28) that is dead code in the
live path — its intended consumer is the commented-out alternative loss at
matrix_factorization.cpp:115-116 (and sigmoid.cpp:27 even shadows its grad
variable, so it would not compile if used). Provided here as live, tested
ops for the loss variants that use them (SigmoidPairwiseLoss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable logistic function (branch-free where form of the
    reference's positive/negative split)."""
    return jnp.where(
        x >= 0,
        1.0 / (1.0 + jnp.exp(-jnp.abs(x))),
        jnp.exp(-jnp.abs(x)) / (1.0 + jnp.exp(-jnp.abs(x))),
    )


def sigmoid_grad(x: jnp.ndarray) -> jnp.ndarray:
    """d sigmoid / dx = s * (1 - s)."""
    s = sigmoid(x)
    return s * (1.0 - s)
