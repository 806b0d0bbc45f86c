from bendy_tpu.utils import color, image, rng, v3  # noqa: F401
