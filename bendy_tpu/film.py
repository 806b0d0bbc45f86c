"""Progressive film accumulation + exact-resume checkpointing.

Mirrors the reference's ``Buffer`` (``src/tracer/buffer.rs``): a raw f32
sum image plus one global sample counter; ``preview`` divides by the count
and converts color space (``buffer.rs:117-138``). Every pixel must receive
the same samples per pass (sample counting is per-film, not per-pixel —
SURVEY quirk #10), which our pass renderer guarantees by construction.

Improvement over the reference: the raw film state (sum + spp + pass
counter + seed) persists to ``.npz``, so renders resume *exactly* — the
reference only ever persisted tonemapped PNGs (``src/main.rs:295``).
"""

from __future__ import annotations

import numpy as np

from bendy_tpu.utils.image import save_png, tonemap


class Film:
    def __init__(self, width: int, height: int, color_space: str = "srgb") -> None:
        self.width = width
        self.height = height
        self.color_space = color_space
        self.clear()

    def clear(self) -> None:
        self.sum = np.zeros((self.height, self.width, 3), np.float32)
        self.samples = 0
        self.passes = 0

    def resize(self, width: int, height: int) -> None:
        self.width = width
        self.height = height
        self.clear()

    def add_pass(self, sums, samples: int) -> None:
        """Accumulate one pass of per-pixel sums carrying ``samples`` spp."""
        self.sum = self.sum + np.asarray(sums, np.float32)
        self.samples += samples
        self.passes += 1

    def preview(self) -> np.ndarray:
        """Tonemapped u8 image (mean over samples, color-space converted)."""
        return tonemap(self.sum, self.samples, self.color_space)

    def mean(self) -> np.ndarray:
        """Linear mean image (float), for MSE gates and tests."""
        return self.sum / max(self.samples, 1)

    def save_png(self, path: str) -> None:
        save_png(path, self.preview())

    # -- exact resume ------------------------------------------------------

    def save_checkpoint(self, path: str, seed: int = 0) -> None:
        np.savez(
            path,
            sum=self.sum,
            samples=self.samples,
            passes=self.passes,
            seed=seed,
            color_space=self.color_space,
        )

    @staticmethod
    def load_checkpoint(path: str) -> tuple["Film", int]:
        z = np.load(path, allow_pickle=False)
        s = z["sum"]
        film = Film(s.shape[1], s.shape[0], str(z["color_space"]))
        film.sum = s.astype(np.float32)
        film.samples = int(z["samples"])
        film.passes = int(z["passes"])
        return film, int(z["seed"])
