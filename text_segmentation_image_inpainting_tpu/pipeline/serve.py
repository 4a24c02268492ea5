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
        chunk: int = 1,
    ):
        self._pipe = pipe
        self._seg_vars = seg_variables
        self._unet_vars = unet_variables
        self._depth = max(1, depth)
        self._sharding = sharding
        self._chunk = max(1, chunk)
        self._inflight: collections.deque = collections.deque()
        self._done: collections.deque = collections.deque()

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
        # chunked dispatch: ONE jit call (and one D2H read) covers `chunk`
        # batches via lax.map — on dispatch-latency-bound links (a tunnel
        # RTT per call) this multiplies sustained throughput by ~chunk
        self._run_chunk = jax.jit(
            lambda sv, uv, stack: jax.lax.map(lambda p: run(sv, uv, p), stack),
            donate_argnums=(2,),
        )

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
        self._inflight.append(
            (False, self._run(self._seg_vars, self._unet_vars, pages))
        )

    def ready(self) -> bool:
        """True if :meth:`collect` will not stall the pipeline (the
        oldest result has ``depth`` newer batches queued behind it)."""
        return len(self._inflight) > self._depth

    def collect(self) -> Tuple[np.ndarray, np.ndarray] | None:
        """Materialize the oldest in-flight result as numpy, or None.
        Chunked dispatches are read back in ONE transfer and handed out
        one logical batch at a time."""
        if self._done:
            return self._done.popleft()
        if not self._inflight:
            return None
        chunked, (clean, mask) = self._inflight.popleft()
        clean, mask = np.asarray(clean), np.asarray(mask)
        if not chunked:
            return clean, mask
        for i in range(1, clean.shape[0]):
            self._done.append((clean[i], mask[i]))
        return clean[0], mask[0]

    def drain(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while self._inflight or self._done:
            yield self.collect()

    # -- pull-style API ---------------------------------------------------
    def serve(
        self, host_batches: Iterable, *, prefetch: int = 2
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """host batches -> (clean_uint8, mask) numpy pairs, pipelined.

        ``host_batches`` yields (N,H,W,3) float arrays in [0,1] or dicts
        with an ``"image"`` key. Order is preserved. With ``chunk=k``,
        k consecutive batches are stacked host-side and ride one
        dispatch + one result read.
        """

        def _images():
            buf = []
            for b in host_batches:
                img = np.asarray(b["image"] if isinstance(b, dict) else b)
                if self._chunk == 1:
                    yield {"image": img}
                    continue
                buf.append(img)
                if len(buf) == self._chunk:
                    yield {"image": np.stack(buf)}
                    buf = []
            for img in buf:  # tail short of a full chunk: per-batch dispatch
                yield {"image": img}

        pf = DevicePrefetcher(_images(), sharding=self._sharding, depth=prefetch)
        try:
            for batch in pf:
                img = batch["image"]
                if self._chunk > 1 and img.ndim == 5:
                    res = self._run_chunk(self._seg_vars, self._unet_vars, img)
                    self._inflight.append((True, res))
                else:
                    self._inflight.append(
                        (False, self._run(self._seg_vars, self._unet_vars, img))
                    )
                while self.ready() and self._inflight:
                    yield self.collect()
                while self._done:
                    yield self._done.popleft()
            yield from self.drain()
        finally:
            pf.close()
