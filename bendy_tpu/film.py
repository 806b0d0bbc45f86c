"""Progressive film accumulation + exact-resume checkpointing.

Mirrors the reference's ``Buffer`` (``src/tracer/buffer.rs``): a raw f32
sum image plus one global sample counter; ``preview`` divides by the count
and converts color space (``buffer.rs:117-138``). Every pixel must receive
the same samples per pass (sample counting is per-film, not per-pixel —
SURVEY quirk #10), which our pass renderer guarantees by construction.

Improvement over the reference: the raw film state (sum + spp + pass
counter + seed) persists to ``.npz``, so renders resume *exactly* — the
reference only ever persisted tonemapped PNGs (``src/main.rs:295``).

Two accumulators:
- :class:`Film` — host numpy sums; every pass round-trips the image.
- :class:`DeviceFilm` — sums stay resident on the accelerator and passes
  chain device-side with NO host synchronization; the image crosses to
  the host only for preview/PNG/checkpoint. On a remote (axon) TPU the
  link runs at ~10-15 MB/s with ~40 ms RTT, so a 256x256 film fetch per
  pass costs more than the pass itself renders — device residency is
  what makes progressive rendering scale (the TPU analogue of never
  leaving HBM).
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


def to_device(film: Film) -> "DeviceFilm":
    """Move a host film's accumulated state onto the accelerator."""
    import jax.numpy as jnp

    out = DeviceFilm(film.width, film.height, film.color_space)
    out.sum = jnp.asarray(film.sum)
    out.samples = film.samples
    out.passes = film.passes
    return out


class DeviceFilm(Film):
    """Film whose running sum lives on the accelerator.

    ``add_pass`` accepts the pass sums as a (possibly still-executing)
    device array and chains the accumulation on device — no transfer, no
    sync. ``block_until_ready`` waits for all queued passes (the honest
    timing point for benchmarks); ``mean``/``preview``/``save_*`` fetch
    once. The host API (samples/passes counters, checkpoint format,
    preview semantics) is identical to :class:`Film`.
    """

    device = True

    def clear(self) -> None:
        import jax.numpy as jnp

        self.sum = jnp.zeros((self.height, self.width, 3), jnp.float32)
        self.samples = 0
        self.passes = 0

    def add_pass(self, sums, samples: int) -> None:
        import jax.numpy as jnp

        self.sum = self.sum + jnp.asarray(sums)  # device-side, async
        self.samples += samples
        self.passes += 1

    def block_until_ready(self) -> "DeviceFilm":
        self.sum.block_until_ready()
        return self

    def _host_sum(self) -> np.ndarray:
        import jax

        return np.asarray(jax.device_get(self.sum), np.float32)

    def preview(self) -> np.ndarray:
        return tonemap(self._host_sum(), self.samples, self.color_space)

    def mean(self) -> np.ndarray:
        return self._host_sum() / max(self.samples, 1)

    def save_checkpoint(self, path: str, seed: int = 0) -> None:
        np.savez(
            path,
            sum=self._host_sum(),
            samples=self.samples,
            passes=self.passes,
            seed=seed,
            color_space=self.color_space,
        )
