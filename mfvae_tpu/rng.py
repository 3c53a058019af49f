"""Named RNG streams.

The reference splits one key into 7 named keys once (jax_ver/main.py:55-56)
and then never re-splits inside its loops — every env step re-uses the same
action/step keys and every buffer sample uses the same sample key
(SURVEY §2.1 "RNG bugs").  Here each stream is an independent counter-based
sequence derived by ``fold_in``: ``stream.next()`` is pure-functional-friendly
(returns key + advanced stream) and ``stream.at(step)`` gives O(1) random
access, which is what a `lax.scan` body wants (fold the loop index in, no
carried key threading needed).

A ``bug_compat`` mode reproduces the reference behavior (same key every call)
for curve-parity experiments.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp


class RngStream(NamedTuple):
    base: jax.Array  # PRNG key
    counter: jax.Array  # int32 scalar
    bug_compat: bool = False

    def at(self, step) -> jax.Array:
        """Key for an absolute step index (use inside scan bodies)."""
        if self.bug_compat:
            return self.base
        return jax.random.fold_in(self.base, step)

    def next(self) -> tuple[jax.Array, "RngStream"]:
        key = self.at(self.counter)
        bump = 0 if self.bug_compat else 1
        return key, self._replace(counter=self.counter + bump)

    def split(self, n: int) -> jax.Array:
        """n keys for vectorized consumers (shape [n, 2])."""
        key, _ = self.next()
        return jax.random.split(key, n)


def make_streams(
    seed: int,
    names: Sequence[str] = ("reset", "act", "step", "sample", "model", "train", "eval"),
    bug_compat: bool = False,
) -> Dict[str, RngStream]:
    """Build independent named streams from one seed.

    Mirrors the reference's named-key vocabulary (jax_ver/main.py:56:
    key_reset, key_act, key_step, key_sample, key_model, key_train) but each
    stream is independently advanceable.
    """
    root = jax.random.PRNGKey(seed)
    out = {}
    for i, name in enumerate(names):
        base = jax.random.fold_in(root, i)
        out[name] = RngStream(base=base, counter=jnp.int32(0), bug_compat=bug_compat)
    return out
