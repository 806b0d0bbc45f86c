from bendy_tpu.utils import color, image, rng, vecmath  # noqa: F401
