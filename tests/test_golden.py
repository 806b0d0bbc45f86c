"""Golden-image regression gates.

Renders are deterministic per (seed, platform); these tiny CPU goldens
catch silent estimator regressions bit-for-bit — the statistical oracle
gates in test_render.py only catch gross errors (SURVEY.md §7 hard part c).

Regenerate deliberately after an *intended* estimator change:
    python3 -c "...see tests/golden/README"
"""

import numpy as np
import pytest

from bendy_tpu.film import Film
from bendy_tpu.render import Config, Renderer, RenderConfig, Subsample
from bendy_tpu.scene import load_scene


@pytest.mark.parametrize("name", ["cornell", "volume"])
def test_golden(name):
    scene = load_scene(f"scenes/{name}.json.gz")
    cam = scene.find_by_tag("camera")
    scene.get_object(cam).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=3))
    film = Film(16, 16)
    r.render(cam, RenderConfig(samples=8, subsample=Subsample(1)), film, seed=7)
    golden = np.load(f"tests/golden/{name}_16x16_mb3_s8_seed7.npy")
    np.testing.assert_allclose(film.mean(), golden, rtol=1e-5, atol=1e-6)
