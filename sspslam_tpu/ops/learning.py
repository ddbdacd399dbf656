"""Online learning rules as pure carry-update functions.

PES (decoder learning) and Voja (encoder drift) — the rules the reference's
AssociativeMemory trains with (associativememory.py:30-43).  Learned weights
live in the simulation carry pytree, so checkpoint/resume of a half-trained
map falls out of serialising the carry.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pes_update", "voja_update"]


def pes_update(decoders, activities, error, learning_rate, dt,
               n_neurons=None):
    """PES decoder update.

    decoders : (n, d) current decoders (value = activities @ decoders).
    activities : (n,) filtered presynaptic activities.
    error : (d,) error signal (recall - target convention: the rule moves the
        decoded value *down* the error).
    Delta = -(learning_rate * dt / n) * outer(activities, error).
    ``n_neurons``: LOGICAL neuron count for the rate normalisation — pass
    it when the decoder rows include phantom mesh-padding neurons so the
    padded build stays bitwise-identical to the unpadded one.
    """
    n = n_neurons if n_neurons is not None else decoders.shape[0]
    alpha = learning_rate * dt / n
    return decoders - alpha * jnp.outer(activities, error)


def voja_update(scaled_encoders, activities, pre_value, learning_signal,
                scale, learning_rate, dt):
    """Voja scaled-encoder update.

    scaled_encoders : (n, d) = encoders * (gain / radius)[:, None].
    activities : (n,) postsynaptic activities.
    pre_value : (d,) key vector driving the ensemble.
    learning_signal : scalar; 1 + (gating input) — learning proceeds at a rate
        proportional to this (0 disables).
    scale : (n,) per-neuron gain/radius, the magnitude each encoder row is
        pulled toward.
    """
    alpha = learning_rate * dt * learning_signal
    delta = alpha * (scale[:, None] * jnp.outer(activities, pre_value)
                     - activities[:, None] * scaled_encoders)
    return scaled_encoders + delta
