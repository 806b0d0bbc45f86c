"""Deterministic RNG key derivation.

The reference seeds one ``SmallRng`` per screen chunk from OS entropy
(``src/tracer/mod.rs:240``), which makes renders non-reproducible and
shard-count dependent. We instead derive a threefry key per *lane* —
a (pixel, sample, pass) triple — so that

- the same seed renders the same image, bit for bit,
- a sharded render equals the single-device render exactly (key
  derivation is independent of the device layout),
- progressive passes never reuse streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lane_keys(seed: int | jax.Array, pass_idx: int | jax.Array, lane_idx: jnp.ndarray) -> jax.Array:
    """One key per lane: fold (pass, lane) into the base seed.

    ``lane_idx`` is an int32 array of global lane indices; the result has
    one threefry key per entry, stable under sharding since lane indices
    are global.
    """
    if isinstance(seed, jax.Array) and jnp.issubdtype(seed.dtype, jax.dtypes.prng_key):
        base = seed
    else:
        base = jax.random.key(seed)
    base = jax.random.fold_in(base, pass_idx)
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(lane_idx)


def iter_uniforms(keys: jax.Array, it: jax.Array, n: int) -> jnp.ndarray:
    """Draw ``n`` U[0,1) floats per lane for loop iteration ``it``.

    A fresh subkey per (lane, iteration) keeps draws independent across
    wavefront steps without carrying mutable RNG state.
    """
    sub = jax.vmap(lambda k: jax.random.fold_in(k, it))(keys)
    return jax.vmap(lambda k: jax.random.uniform(k, (n,)))(sub)
