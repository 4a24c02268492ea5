"""Streaming page-serving loop — sustained throughput, not closed-loop.

The reference serves pages one ``cv2``-roundtrip at a time; here the
whole service path is pipelined on-device (SURVEY.md §2.2 pipeline
disposition follow-on): a :class:`~..data.pipeline.DevicePrefetcher`
thread overlaps host production + H2D, JAX async dispatch overlaps
device compute across consecutive batches, and results are materialized
(D2H) only once ``depth`` newer batches are in flight — so the D2H read
of batch *i* rides under the compute of batches *i+1..i+depth*.

    server = PageStreamServer(pipe, seg_vars, unet_vars)
    for clean, mask in server.serve(host_batches):   # numpy in, numpy out
        ...

``submit``/``collect`` expose the same double-buffering for push-style
callers. Outputs are uint8 pages by default: serving wants images, and
halving the D2H bytes matters on tunnel-attached TPUs.
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text_segmentation_image_inpainting_tpu.data.pipeline import DevicePrefetcher


class PageStreamServer:
    """Double-buffered streaming executor for :class:`TextRemovalPipeline`.

    depth: in-flight batches before the oldest result is materialized.
    2 is enough to hide D2H under compute; raise it if host reads are
    slow relative to a batch's device time.
    """

    def __init__(
        self,
        pipe,
        seg_variables,
        unet_variables,
        *,
        depth: int = 2,
        output_uint8: bool = True,
        sharding: Any = None,
    ):
        self._pipe = pipe
        self._seg_vars = seg_variables
        self._unet_vars = unet_variables
        self._depth = max(1, depth)
        self._sharding = sharding
        self._inflight: collections.deque = collections.deque()

        def run(seg_v, unet_v, pages):
            if pages.dtype == jnp.uint8:
                # uint8 over the wire: 4x fewer H2D bytes than float32 —
                # on tunnel-attached TPUs the input transfer, not compute,
                # bounds sustained serving throughput
                pages = pages.astype(pipe.compute_dtype) * (1.0 / 255.0)
            else:
                pages = pages.astype(pipe.compute_dtype)
            clean, mask = pipe.run(seg_v, unet_v, pages)
            if output_uint8:
                clean = jnp.round(
                    jnp.clip(clean.astype(jnp.float32), 0.0, 1.0) * 255.0
                ).astype(jnp.uint8)
                mask = mask.astype(jnp.uint8)
            return clean, mask

        self._run = jax.jit(run, donate_argnums=(2,))

    # -- push-style API ---------------------------------------------------
    def submit(self, pages) -> None:
        """Dispatch one batch ((N,H,W,3): uint8 in [0,255] — preferred,
        4x cheaper H2D — or float in [0,1]); returns immediately. Call
        :meth:`collect` to drain results."""
        pages = np.asarray(pages) if not isinstance(pages, jax.Array) else pages
        if pages.dtype != np.uint8:
            pages = jnp.asarray(pages, dtype=self._pipe.compute_dtype)
        pages = jax.device_put(pages, self._sharding) if self._sharding is not None \
            else jnp.asarray(pages)
        self._inflight.append(self._run(self._seg_vars, self._unet_vars, pages))

    def ready(self) -> bool:
        """True if :meth:`collect` will not stall the pipeline (the
        oldest result has ``depth`` newer batches queued behind it)."""
        return len(self._inflight) > self._depth

    def collect(self) -> Tuple[np.ndarray, np.ndarray] | None:
        """Materialize the oldest in-flight result as numpy, or None."""
        if not self._inflight:
            return None
        clean, mask = self._inflight.popleft()
        return np.asarray(clean), np.asarray(mask)

    def drain(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while self._inflight:
            yield self.collect()

    # -- pull-style API ---------------------------------------------------
    def serve(
        self, host_batches: Iterable, *, prefetch: int = 2
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """host batches -> (clean_uint8, mask) numpy pairs, pipelined.

        ``host_batches`` yields (N,H,W,3) float arrays in [0,1] or dicts
        with an ``"image"`` key. Order is preserved.
        """

        def _images():
            for b in host_batches:
                img = b["image"] if isinstance(b, dict) else b
                yield {"image": np.asarray(img)}

        pf = DevicePrefetcher(_images(), sharding=self._sharding, depth=prefetch)
        try:
            for batch in pf:
                self._inflight.append(
                    self._run(self._seg_vars, self._unet_vars, batch["image"])
                )
                if self.ready():
                    yield self.collect()
            yield from self.drain()
        finally:
            pf.close()
