"""bendy-tpu: a TPU-native relativistic Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``soycan-sim/bendy-tracer`` CPU renderer (reference mounted read-only at
``/root/reference``), redesigned TPU-first:

- the reference's recursive per-ray sampler (``src/tracer/mod.rs:322``)
  becomes a *wavefront* integrator: one ``lax.while_loop`` over a megabatch
  of ray lanes with branchless masked material dispatch,
- rayon tile parallelism (``src/tracer/mod.rs:194``) becomes
  ``shard_map`` over a ``jax.sharding.Mesh`` of TPU chips,
- entropy-seeded per-chunk RNG (``src/tracer/mod.rs:240``) becomes
  deterministic counter-based threefry keys per (pixel, sample),
- and the advertised-but-unimplemented gravitational lensing gains a real
  RK4 null-geodesic propagator (``bendy_tpu.geodesic``).

Layout:
    utils/     color transfer, vector math, RNG, image IO
    scene/     scene graph + (de)serialization + SoA scene compiler
    ops/       device compute: samplers, intersections, materials,
               volumes, camera rays, the wavefront integrator
    parallel/  device-mesh sharding of render passes
    models/    ready-made scene constructions (cornell, lensed showcase)
    film.py    progressive accumulation buffer + checkpointing
    render.py  Renderer / Config / RenderConfig front-end
    cli.py     command-line interface mirroring the reference binary
"""

__version__ = "0.1.0"

from bendy_tpu.render import Config, Output, RenderConfig, Renderer, Subsample  # noqa: F401,E402
from bendy_tpu.film import Film  # noqa: F401,E402
