"""Ready-made scene constructions.

- :func:`bendy_tpu.models.cornell.build_cornell` — the reference app's
  built-in default scene (``src/main.rs:108-213``).
- :func:`bendy_tpu.models.blackhole.build_blackhole` — the lensed
  showcase (Schwarzschild mass, emissive stars, accretion ring).
- :func:`bendy_tpu.models.binary_blackhole.build_binary_blackhole` —
  two-mass lensing.
- :func:`bendy_tpu.models.blackhole_cloud.build_blackhole_cloud` —
  volumetric accretion disk (geodesic × participating media).
"""

from bendy_tpu.models.blackhole import build_blackhole  # noqa: F401
from bendy_tpu.models.binary_blackhole import build_binary_blackhole  # noqa: F401
from bendy_tpu.models.blackhole_cloud import build_blackhole_cloud  # noqa: F401
from bendy_tpu.models.cornell import build_cornell  # noqa: F401
