"""Multi-host (pod / DCN) rendering.

The single-host story is :mod:`bendy_tpu.parallel.mesh`: rays are data
parallel over ICI with one film ``psum``. Across hosts the same program
runs SPMD — each process drives its local chips, the mesh spans all of
them, and the only cross-host traffic is the sample-axis film reduction
(bytes: H·W·3·4 per pass) plus the final host gather.

This module is the thin bootstrap; it cannot be exercised in a
single-host image, so it stays deliberately minimal and is excluded from
coverage expectations.

Usage on each host of a pod slice:

    from bendy_tpu.parallel.multihost import initialize
    initialize(coordinator="host0:1234", num_processes=N, process_id=i)
    mesh = make_mesh(tiles, samples)     # over jax.devices(): all chips
    ... render_film_sharded(...)         # identical SPMD program
    if jax.process_index() == 0:
        film.save_png(...)               # rows land fully replicated or
                                         # use multihost_utils to gather
"""

from __future__ import annotations

from typing import Optional


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with env-var fallback.

    On Cloud TPU pods the arguments auto-detect from the metadata server;
    pass them explicitly elsewhere. Must run before any backend
    initialization (first ``jax.devices()`` / first traced computation).

    On the CPU platform, multi-process execution additionally needs a
    cross-process collectives backend — without it every process sees
    only itself (``process_count() == 1``) and the mesh silently shrinks.
    """
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # plugin sitecustomize hooks can override the env var at interpreter
        # start; an explicit config update after import always wins
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def film_to_host0(sums):
    """Gather a ('tiles',)-sharded film to every process as numpy.

    ``tiled=True``: the film rows are shards of ONE global image — gather
    concatenates along the existing (row) axis instead of stacking a new
    per-process axis (required for non-fully-addressable arrays).
    """
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(sums, tiled=True)
