"""Microphone beam patterns (reference/utils/spatialization.py:4-27).

The reference ships a wide-cardioid gain pattern (unreferenced by its
runners, but part of the public utils surface); re-expressed in JAX so
it can sit inside a jitted render if a directional-microphone model is
ever enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wide_cardioid_beam_pattern(
    facing_direction: jax.typing.ArrayLike,
    phi: jax.typing.ArrayLike,
    base_level: float = 2.0,
) -> jax.Array:
    """Microphone gain at query directions `phi` (radians) for a mic
    facing `facing_direction`.

    Wide cardioid: main lobe (1 + cos(φ−θ))/2 plus a base level
    (a falsy base_level becomes 1.0 — reference quirk,
    spatialization.py:22-24), normalized to a peak gain of 1.
    """
    phi = jnp.asarray(phi)
    main_lobe_gain = (1.0 + jnp.cos(phi - facing_direction)) / 2.0
    if not base_level:
        base_level = 1.0
    gain = main_lobe_gain + base_level
    return gain / jnp.max(gain)
