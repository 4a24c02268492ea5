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
callers, including the ``chunk=k`` megabatch dispatch (k submits buffer
host-side, ride ONE jit call + ONE result read — call :meth:`flush` or
:meth:`drain` to push out a partial tail). Outputs are uint8 pages by
default: serving wants images, and halving the D2H bytes matters on
tunnel-attached TPUs.

``sparse_tiles=K`` switches the result wire format to changed-tiles-only
(:mod:`.sparse`): the device ships the ≤K mask-touched 32² tiles of each
page in one flat uint8 buffer and the host pastes them over the caller's
original page — text covers a small fraction of a page, so D2H bytes
drop ~4-10x, which is the whole game on a ~16-21 MB/s tunnel link.
Pages whose changed-tile count exceeds K fall back to a dense dispatch.
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text_segmentation_image_inpainting_tpu.data.pipeline import DevicePrefetcher
from text_segmentation_image_inpainting_tpu.pipeline.sparse import (
    sparse_flatten,
    sparse_pack,
    sparse_recompose,
    sparse_unflatten,
)


class PageStreamServer:
    """Double-buffered streaming executor for :class:`TextRemovalPipeline`.

    depth: in-flight batches before the oldest result is materialized.
    2 is enough to hide D2H under compute; raise it if host reads are
    slow relative to a batch's device time.
    chunk: stack k logical batches per dispatch/read (lax.map) — on
    dispatch-latency-bound links this multiplies sustained throughput.
    sparse_tiles: >0 returns changed tiles only (see module docstring);
    requires ``output_uint8``.
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
        sparse_tiles: int = 0,
        tile: int = 32,
    ):
        self._pipe = pipe
        self._seg_vars = seg_variables
        self._unet_vars = unet_variables
        self._depth = max(1, depth)
        self._sharding = sharding
        self._chunk = max(1, chunk)
        self._sparse = int(sparse_tiles)
        self._tile = tile
        if self._sparse and not output_uint8:
            raise ValueError("sparse_tiles requires output_uint8=True (uint8 wire format)")
        if self._sparse and tile % 8 != 0:
            # the wire format packs mask pixels 8/byte along the tile row
            raise ValueError(f"sparse serving needs tile % 8 == 0, got tile={tile}")
        # Adaptive tile budget: ``sparse_tiles`` is the MAX budget (and
        # the compile-time cap); each dispatch actually ships the
        # smallest power-of-two budget that covered the recently
        # OBSERVED changed-tile counts with 25% headroom. D2H bytes are
        # proportional to the budget, and on a tunnel-attached chip the
        # result wire is the serving wall (docs/STATUS.md: ~15-27 MB/s
        # D2H) — so tracking the content's real density is a direct
        # throughput lever. Undershoot is safe: the packed ``count``
        # field detects overflow and :meth:`_materialize_sparse` retries
        # at the max budget (then densely if even that overflows).
        self._k_levels = []
        if self._sparse:
            lv = 16
            while lv < self._sparse:
                self._k_levels.append(lv)
                lv *= 2
            self._k_levels.append(self._sparse)
        self._k_next = self._sparse  # start safe, shrink to content
        self._recent_counts: collections.deque = collections.deque(maxlen=8)
        self._wire_bytes = 0  # cumulative flat-buffer D2H bytes (bench)
        # in-flight entries:
        # (chunked, k_used (0 = dense), device_result, host_pages_u8|None)
        self._inflight: collections.deque = collections.deque()
        self._done: collections.deque = collections.deque()
        self._pending: list = []  # chunked submit buffer (host side)

        def _to_compute(pages):
            if pages.dtype == jnp.uint8:
                # uint8 over the wire: 4x fewer H2D bytes than float32 —
                # on tunnel-attached TPUs the input transfer, not compute,
                # bounds sustained serving throughput
                return pages.astype(pipe.compute_dtype) * (1.0 / 255.0)
            return pages.astype(pipe.compute_dtype)

        def run(seg_v, unet_v, pages):
            clean, mask = pipe.run(seg_v, unet_v, _to_compute(pages))
            if output_uint8:
                clean = jnp.round(
                    jnp.clip(clean.astype(jnp.float32), 0.0, 1.0) * 255.0
                ).astype(jnp.uint8)
                mask = mask.astype(jnp.uint8)
            return clean, mask

        def run_sparse(seg_v, unet_v, pages, k):
            clean, mask = pipe.run(seg_v, unet_v, _to_compute(pages))
            packed = sparse_pack(clean, mask[..., 0], max_tiles=k, tile=self._tile)
            return sparse_flatten(packed)

        self._run = jax.jit(run, donate_argnums=(2,))
        # chunked dispatch: ONE jit call (and one D2H read) covers `chunk`
        # batches via lax.map — on dispatch-latency-bound links (a tunnel
        # RTT per call) this multiplies sustained throughput by ~chunk
        self._run_chunk = jax.jit(
            lambda sv, uv, stack: jax.lax.map(lambda p: run(sv, uv, p), stack),
            donate_argnums=(2,),
        )
        # per-budget executables (k is a static shape parameter); built
        # lazily — a stream usually settles on one or two k levels
        self._run_sparse = jax.jit(run_sparse, static_argnums=(3,), donate_argnums=(2,))
        self._run_sparse_chunk = jax.jit(
            lambda sv, uv, stack, k: jax.lax.map(
                lambda p: run_sparse(sv, uv, p, k), stack
            ),
            static_argnums=(3,),
            donate_argnums=(2,),
        )

    # -- dispatch helpers --------------------------------------------------
    def _host_u8(self, pages) -> np.ndarray:
        """Caller's pages as the uint8 canvas sparse recompose pastes on."""
        pages = np.asarray(pages)
        if pages.dtype != np.uint8:
            pages = np.round(np.clip(pages, 0.0, 1.0) * 255.0).astype(np.uint8)
        return pages

    def _device_put(self, pages):
        if not isinstance(pages, jax.Array):
            pages = np.asarray(pages)
        return (
            jax.device_put(pages, self._sharding)
            if self._sharding is not None
            else jnp.asarray(pages)
        )

    def _dispatch(self, pages, *, chunked: bool) -> None:
        host = self._host_u8(pages) if self._sparse else None
        dev = self._device_put(host if host is not None else pages)
        self._enqueue(dev, host, chunked=chunked)

    def _enqueue(self, dev, host, *, chunked: bool) -> None:
        if self._sparse:
            k = self._k_next
            fn = self._run_sparse_chunk if chunked else self._run_sparse
            res = fn(self._seg_vars, self._unet_vars, dev, k)
            self._inflight.append((chunked, k, res, host))
        else:
            fn = self._run_chunk if chunked else self._run
            self._inflight.append(
                (chunked, 0, fn(self._seg_vars, self._unet_vars, dev), None)
            )

    def _observe_counts(self, counts: np.ndarray) -> None:
        """Track recent changed-tile demand; pick the next dispatch's
        power-of-two budget with 25% headroom over the last 8 batches."""
        self._recent_counts.append(int(counts.max(initial=0)))
        target = max(1, int(max(self._recent_counts) * 1.25) + 1)
        self._k_next = next(
            (lv for lv in self._k_levels if lv >= target), self._k_levels[-1]
        )

    @property
    def wire_bytes(self) -> int:
        """Cumulative sparse-result D2H bytes (bench accounting)."""
        return self._wire_bytes

    # -- push-style API ----------------------------------------------------
    def submit(self, pages) -> None:
        """Queue one batch ((N,H,W,3): uint8 in [0,255] — preferred, 4x
        cheaper H2D — or float in [0,1]); returns immediately. With
        ``chunk=k`` the dispatch happens every k-th submit (ONE jit call
        for the k buffered batches); :meth:`flush`/:meth:`drain` push
        out a partial tail. Call :meth:`collect` to drain results."""
        if self._chunk == 1:
            self._dispatch(pages, chunked=False)
            return
        self._pending.append(np.asarray(pages))
        if len(self._pending) == self._chunk:
            stack, self._pending = np.stack(self._pending), []
            self._dispatch(stack, chunked=True)

    def flush(self) -> None:
        """Dispatch buffered submits short of a full chunk (per-batch)."""
        pending, self._pending = self._pending, []
        for pages in pending:
            self._dispatch(pages, chunked=False)

    def ready(self) -> bool:
        """True if :meth:`collect` will not stall the pipeline (the
        oldest result has ``depth`` newer batches queued behind it)."""
        return len(self._inflight) > self._depth

    def _materialize_sparse(self, buf, host, k_used: int) -> Tuple[np.ndarray, np.ndarray]:
        # sparse_pack clamps its slot count to the page's tile count, so
        # unflatten with the same clamp (a 256² page has 64 tiles — a
        # K=96 budget must not be read back as 96 slots)
        h, w = host.shape[1:3]
        t = (h // self._tile) * (w // self._tile)
        k = min(k_used, t)
        buf = np.asarray(buf)
        self._wire_bytes += buf.nbytes
        packed = sparse_unflatten(buf, max_tiles=k, tile=self._tile)
        # packed.count is the TRUE changed-tile count (even when > k) —
        # feed the budget tracker before any fallback
        self._observe_counts(np.asarray(packed.count))
        clean, mask, overflow = sparse_recompose(host, packed, tile=self._tile)
        kmax = min(self._sparse, t)
        if overflow.any() and k < kmax:
            # adaptive budget undershot this batch: retry at the MAX
            # budget, still on the sparse wire (cheaper than dense)
            buf2 = np.asarray(
                self._run_sparse(
                    self._seg_vars, self._unet_vars, self._device_put(host), self._sparse
                )
            )
            self._wire_bytes += buf2.nbytes
            packed2 = sparse_unflatten(buf2, max_tiles=kmax, tile=self._tile)
            clean2, mask2, overflow2 = sparse_recompose(host, packed2, tile=self._tile)
            clean[overflow], mask[overflow] = clean2[overflow], mask2[overflow]
            overflow = overflow & overflow2
        if overflow.any():
            # rare: more changed tiles than even the max budget — redo
            # the batch densely and keep the dense overflowed pages.
            # Honor the server's sharding: jnp.asarray would compile a
            # second (unsharded) executable and run on one device.
            dc, dm = self._run(self._seg_vars, self._unet_vars, self._device_put(host))
            dc, dm = np.asarray(dc), np.asarray(dm)
            clean[overflow], mask[overflow] = dc[overflow], dm[overflow]
        return clean, mask

    def collect(self) -> Tuple[np.ndarray, np.ndarray] | None:
        """Materialize the oldest in-flight result as numpy, or None.
        Chunked dispatches are read back in ONE transfer and handed out
        one logical batch at a time."""
        if self._done:
            return self._done.popleft()
        if not self._inflight:
            return None
        chunked, k_used, res, host = self._inflight.popleft()
        if k_used:
            bufs = np.asarray(res)
            if not chunked:
                return self._materialize_sparse(bufs, host, k_used)
            for b, h in zip(bufs, host):
                self._done.append(self._materialize_sparse(b, h, k_used))
            return self._done.popleft()
        clean, mask = np.asarray(res[0]), np.asarray(res[1])
        if not chunked:
            return clean, mask
        for i in range(1, clean.shape[0]):
            self._done.append((clean[i], mask[i]))
        return clean[0], mask[0]

    def drain(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        self.flush()
        while self._inflight or self._done:
            yield self.collect()

    # -- pull-style API ----------------------------------------------------
    def serve(
        self, host_batches: Iterable, *, prefetch: int = 2
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """host batches -> (clean_uint8, mask) numpy pairs, pipelined.

        ``host_batches`` yields (N,H,W,3) float arrays in [0,1] or dicts
        with an ``"image"`` key. Order is preserved. With ``chunk=k``,
        k consecutive batches are stacked host-side and ride one
        dispatch + one result read.
        """
        host_q: collections.deque = collections.deque()  # sparse paste canvases

        def _images():
            buf = []
            for b in host_batches:
                img = np.asarray(b["image"] if isinstance(b, dict) else b)
                if self._sparse:
                    img = self._host_u8(img)
                if self._chunk == 1:
                    host_q.append(img)
                    yield {"image": img}
                    continue
                buf.append(img)
                if len(buf) == self._chunk:
                    stack = np.stack(buf)
                    buf = []
                    host_q.append(stack)
                    yield {"image": stack}
            for img in buf:  # tail short of a full chunk: per-batch dispatch
                host_q.append(img)
                yield {"image": img}

        pf = DevicePrefetcher(_images(), sharding=self._sharding, depth=prefetch)
        try:
            for batch in pf:
                img = batch["image"]
                host = host_q.popleft()
                chunked = self._chunk > 1 and img.ndim == 5
                self._enqueue(img, host if self._sparse else None, chunked=chunked)
                while self.ready() and self._inflight:
                    yield self.collect()
                while self._done:
                    yield self._done.popleft()
            while self._inflight or self._done:
                yield self.collect()
        finally:
            pf.close()
