"""Deterministic counter-based RNG on [B] u32 arrays.

The reference seeds one ``SmallRng`` per screen chunk from OS entropy
(``src/tracer/mod.rs:240``) — non-reproducible and shard-count dependent.
We instead hash (seed, pass, lane, iteration, slot) counters, so:

- the same seed renders the same image, bit for bit,
- sharded / row-chunked / sample-chunked renders are IDENTICAL to the
  single-dispatch render (lane ids are global),
- no per-lane key state is carried: pure counter-mode, pure [B] u32
  elementwise ops that fuse into the surrounding VPU kernels. (The earlier
  typed-key + vmap(fold_in) formulation cost ~15 ms per wavefront
  iteration at 512k lanes; this costs microseconds.)

Two hash tiers:
- ``threefry2x32`` (20 rounds, the PRF JAX's own PRNG builds on — Salmon
  et al., SC'11) hashes (seed, pass) into the per-pass key: run once per
  pass, full crypto-strength margin at zero hot-loop cost.
- ``pcg4d`` (Jarzynski & Olano, JCGT 2020 — the top performer of their
  GPU-rendering hash study) generates the per-iteration uniforms: four
  32-bit words for ~40 VPU ops, ~6x cheaper per word than Threefry-20.
  The hot loop draws 10 uniforms per iteration (6 shade + 4 camera), so
  this is the single largest per-iteration cost lever (measured ~20% of
  the megakernel body).
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


def pcg4d(a, b, c, d):
    """PCG4D hash: 4 u32 in -> 4 decorrelated u32 out (Jarzynski & Olano,
    JCGT 2020, listing 19). ~40 fused VPU ops for 128 output bits."""
    m = jnp.uint32(1664525)
    inc = jnp.uint32(1013904223)
    a = jnp.asarray(a, jnp.uint32) * m + inc
    b = jnp.asarray(b, jnp.uint32) * m + inc
    c = jnp.asarray(c, jnp.uint32) * m + inc
    d = jnp.asarray(d, jnp.uint32) * m + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def lane_uniforms(key: tuple, lane: jnp.ndarray, tag, n: int) -> list[jnp.ndarray]:
    """``n`` independent U[0,1) floats per lane for stream ``tag``.

    tag identifies the draw site (wavefront iteration 0..2^20, camera =
    CAMERA_TAG, ...); the hash input (lane, tag*16 + block, key) is unique
    per draw for n <= 64.
    """
    k0, k1 = key
    out = []
    base = jnp.asarray(tag, jnp.uint32) * jnp.uint32(16)
    for block in range((n + 3) // 4):
        words = pcg4d(lane.astype(jnp.uint32), base + jnp.uint32(block), k0, k1)
        out.extend(_to_unit_float(w) for w in words)
    return out[:n]


CAMERA_TAG = 0x100000  # wavefront iterations use tags < 2^20
