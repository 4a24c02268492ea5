"""Grain input pipelines (SURVEY.md C10 rebuilt).

The reference uses ``torch.utils.data.Dataset`` + ``DataLoader`` worker
processes (SURVEY.md section 3.1 marks host-side decode as a hot spot).
Here the host side is a Grain pipeline over *procedural* sample sources
(synthetic manga pages + text overlays / hole masks — this environment
has no dataset on disk and no network), and the device side double-
buffers host->device transfers so the TPU never waits on the host
(BASELINE.json config 5 "batched multi-page streaming").

Swap ``PageSource`` for a disk-backed source (image folder) by giving
``paths``; decode stays on the host, resize/normalize run on device in
the training step.
"""

from __future__ import annotations

import dataclasses
import threading
from queue import Queue
from typing import Any, Iterator, Sequence

import numpy as np

try:
    import grain.python as grain

    _HAS_GRAIN = True
except Exception:  # pragma: no cover
    _HAS_GRAIN = False

from text_segmentation_image_inpainting_tpu.data.text_overlay import (
    segmentation_sample,
)


@dataclasses.dataclass
class PageSource:
    """Random-access source of (image, mask) pairs.

    kind='seg'     -> (page_with_text, text_mask)
    kind='inpaint' -> (clean_page, hole_mask)  [mask: 1 = valid]
    With ``paths`` set, real images are decoded from disk and the same
    synthetic overlays/holes are applied on top.
    """

    kind: str = "seg"
    size: tuple[int, int] = (512, 512)
    length: int = 1 << 16
    seed: int = 0
    paths: Sequence[str] | None = None

    def __len__(self) -> int:
        return self.length

    def _load_base(self, rng: np.random.Generator):
        if not self.paths:
            return None
        from PIL import Image

        p = self.paths[int(rng.integers(0, len(self.paths)))]
        img = Image.open(p).convert("RGB")
        # random crop to self.size; undersized images get an
        # aspect-preserving upscale (never a distorting stretch)
        w, h = img.size
        th, tw = self.size
        if w < tw or h < th:
            scale = max(tw / w, th / h)
            img = img.resize(
                (max(tw, round(w * scale)), max(th, round(h * scale))),
                Image.BILINEAR,
            )
            w, h = img.size
        x0 = int(rng.integers(0, w - tw + 1))
        y0 = int(rng.integers(0, h - th + 1))
        img = img.crop((x0, y0, x0 + tw, y0 + th))
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if rng.random() < 0.5:  # horizontal flip
            arr = arr[:, ::-1]
        return np.ascontiguousarray(arr)

    def __getitem__(self, idx: int):
        rng = np.random.default_rng((self.seed << 32) ^ int(idx))
        base = self._load_base(rng)
        if self.kind == "seg":
            if base is None:
                img, mask = segmentation_sample(rng, self.size)
            else:
                from text_segmentation_image_inpainting_tpu.data.text_overlay import (
                    overlay_text,
                )

                img, mask = overlay_text(base, rng)
            return {"image": img, "mask": mask}
        if base is None:
            # fully synthetic: the C++ page engine (native_pages) renders
            # page + text mask + hole mix in one pass (PIL fallback inside)
            from text_segmentation_image_inpainting_tpu.data.text_overlay import (
                inpainting_sample,
            )

            img, mask = inpainting_sample(rng, self.size)
            return {"image": img, "mask": mask}

        from text_segmentation_image_inpainting_tpu.data import native_masks
        from text_segmentation_image_inpainting_tpu.data.text_overlay import (
            overlay_text,
        )

        img = base
        if rng.random() < 0.5:
            # text-shaped holes (the product case), like the reference
            _, text_mask = overlay_text(img, rng)
            mask = (1.0 - text_mask).astype(np.float32)
        else:
            # irregular strokes/rects via the native C++ rasterizer
            # (11x faster than numpy on this host; numpy fallback inside)
            mask = native_masks.random_hole_masks(
                [int(rng.integers(0, 2**63))], self.size
            )[0]
        return {"image": img, "mask": mask}


IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def list_image_paths(data_dir: str) -> list[str]:
    """Recursive, case-insensitive image scan for the CLI --data-dir
    flags. Raises ``SystemExit`` when nothing matches: silently falling
    back to synthetic pages trained the wrong data (review finding,
    round 3) — a typo'd path must fail loudly."""
    import os

    paths = sorted(
        os.path.join(root, f)
        for root, _, files in os.walk(data_dir)
        for f in files
        if f.lower().endswith(IMAGE_EXTS)
    )
    if not paths:
        raise SystemExit(
            f"--data-dir {data_dir}: no image files found "
            f"(extensions {', '.join(IMAGE_EXTS)}, case-insensitive)"
        )
    return paths


def make_dataset(
    kind: str,
    *,
    batch_size: int = 8,
    size: tuple[int, int] = (512, 512),
    seed: int = 0,
    num_workers: int = 0,
    paths: Sequence[str] | None = None,
) -> Iterator[dict]:
    """Infinite iterator of numpy batches {'image': (B,H,W,3), 'mask': (B,H,W,1)}."""
    source = PageSource(kind=kind, size=size, seed=seed, paths=paths)
    if _HAS_GRAIN:
        ds = (
            grain.MapDataset.source(source)
            .seed(seed)
            .shuffle()
            .repeat()
            .batch(batch_size, drop_remainder=True)
        )
        it = ds.to_iter_dataset(
            grain.ReadOptions(num_threads=max(1, num_workers), prefetch_buffer_size=2)
        )
        return iter(it)

    def _gen():  # pragma: no cover — grain is installed in this env
        i = 0
        while True:
            batch = [source[(i + j) % len(source)] for j in range(batch_size)]
            i += batch_size
            yield {k: np.stack([b[k] for b in batch]) for k in batch[0]}

    return _gen()


def make_page_stream_u8(
    batch_size: int = 8,
    size: tuple[int, int] = (512, 512),
    seed: int = 0,
) -> Iterator[dict]:
    """Infinite iterator of serving-format batches {'image': (B,H,W,3) uint8}.

    The u8 form is what a production image source holds and what the
    serving path uploads (4x fewer H2D bytes than float32). With the
    native C++ page engine available this skips the float round-trip
    entirely (~1500 pages/s on this one-core host vs ~80 for the PIL
    path); otherwise it quantizes the PIL samples.
    """
    from text_segmentation_image_inpainting_tpu.data import native_pages

    if native_pages.available():

        def _native():
            i = 0
            while True:
                seeds = [((seed + 1) << 40) ^ (i + j) for j in range(batch_size)]
                img, _ = native_pages.synth_pages_u8(seeds, size, mode="seg")
                i += batch_size
                yield {"image": img}

        return _native()

    it = make_dataset("seg", batch_size=batch_size, size=size, seed=seed)

    def _quantized():
        for b in it:
            yield {"image": np.round(b["image"] * 255.0).astype(np.uint8)}

    return _quantized()


class DevicePrefetcher:
    """Overlap host batch production + H2D transfer with device compute.

    A background thread pulls host batches, places them on device (with
    the given sharding), and keeps ``depth`` batches in flight — the
    JAX-native equivalent of the reference DataLoader's worker prefetch.
    """

    def __init__(self, host_iter: Iterator[dict], sharding: Any = None, depth: int = 2):
        import jax

        self._it = host_iter
        self._q: Queue = Queue(maxsize=depth)
        self._sharding = sharding
        self._stop = threading.Event()

        def _worker():
            from queue import Full

            def _put(item):
                # bounded put so close() can unblock a producer stuck on a
                # full queue (infinite datasets never re-reach the loop check)
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.2)
                        return True
                    except Full:
                        continue
                return False

            try:
                for batch in self._it:
                    if self._stop.is_set():
                        return
                    if self._sharding is not None:
                        batch = jax.tree.map(
                            lambda x: jax.device_put(x, self._sharding), batch
                        )
                    else:
                        batch = jax.tree.map(jax.device_put, batch)
                    if not _put(batch):
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised in __next__
                # a dead worker (e.g. corrupt image raising in PIL) must not
                # leave the consumer blocked forever on Queue.get()
                _put(e)
                return
            if not self._stop.is_set():
                self._q.put(None)

        self._thread = threading.Thread(target=_worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        # a worker that died delivered its exception once; it will never
        # enqueue the None sentinel, so later calls must not block on get()
        if getattr(self, "_dead", False):
            raise StopIteration
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, BaseException):
            self._dead = True
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain so a producer blocked mid-put can finish and exit, freeing
        # the device-resident batches it pinned
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=5)
