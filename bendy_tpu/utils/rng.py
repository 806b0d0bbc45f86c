"""Deterministic counter-based RNG: raw Threefry-2x32-20 on [B] u32 arrays.

The reference seeds one ``SmallRng`` per screen chunk from OS entropy
(``src/tracer/mod.rs:240``) — non-reproducible and shard-count dependent.
We instead hash (seed, pass, lane, iteration, slot) through Threefry, so:

- the same seed renders the same image, bit for bit,
- sharded / row-chunked / sample-chunked renders are IDENTICAL to the
  single-dispatch render (lane ids are global),
- no per-lane key state is carried: pure counter-mode, pure [B] u32
  elementwise ops that fuse into the surrounding VPU kernels. (The earlier
  typed-key + vmap(fold_in) formulation cost ~15 ms per wavefront
  iteration at 512k lanes; this costs microseconds.)

Threefry-2x32-20 is the same PRF JAX's own PRNG builds on (Salmon et al.,
SC'11); implemented here directly so the counter layout is explicit.
"""

from __future__ import annotations

import jax.numpy as jnp

_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
_PARITY = 0x1BD11BDA


def _rotl(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << r) | (x >> (32 - r))


def threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32, 20 rounds. All args uint32 arrays/scalars; returns 2 words."""
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(x0, jnp.uint32)
    x1 = jnp.asarray(x1, jnp.uint32)
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(_PARITY))
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for g in range(1, 6):
        rots = _ROT_A if g % 2 == 1 else _ROT_B
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[g % 3]
        x1 = x1 + ks[(g + 1) % 3] + jnp.uint32(g)
    return x0, x1


def _to_unit_float(bits: jnp.ndarray) -> jnp.ndarray:
    """u32 -> f32 in [0, 1): top 24 bits scaled by 2^-24.

    The intermediate cast goes via int32 (always < 2^24 after the shift):
    Mosaic's TPU lowering has no u32->f32 conversion.
    """
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def render_key(seed, pass_idx) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hash (seed, pass) into a per-pass key pair."""
    return threefry2x32(jnp.uint32(0x9E3779B9), jnp.uint32(0xBB67AE85), seed, pass_idx)


def lane_uniforms(key: tuple, lane: jnp.ndarray, tag, n: int) -> list[jnp.ndarray]:
    """``n`` independent U[0,1) floats per lane for stream ``tag``.

    tag identifies the draw site (wavefront iteration 0..2^20, camera =
    CAMERA_TAG, ...); counter = (lane, tag*16 + block) is unique for
    n <= 32.
    """
    k0, k1 = key
    out = []
    base = jnp.asarray(tag, jnp.uint32) * jnp.uint32(16)
    for block in range((n + 1) // 2):
        b0, b1 = threefry2x32(k0, k1, lane.astype(jnp.uint32), base + jnp.uint32(block))
        out.append(_to_unit_float(b0))
        out.append(_to_unit_float(b1))
    return out[:n]


CAMERA_TAG = 0x100000  # wavefront iterations use tags < 2^20
