"""Sparse (ROI-tile) result return for serving — cut D2H bytes.

The reference's notebook glue returns the whole inpainted page
(SURVEY.md C12 [R]); on a bandwidth-starved device link (this rig's
axon tunnel moves ~16-21 MB/s D2H) the dense 512^2x3 uint8 page —
~786 KB — is the serving wall, while text touches only a small
fraction of it. The pipeline's composite is ``valid*page +
text*inpaint``: every pixel OUTSIDE the dilated text mask is the input
byte. So the device only needs to ship the tiles the mask touches.

Device side (:func:`sparse_pack`): the clean page and text mask are cut
into ``TS x TS`` tiles; a tile is *changed* iff any dilated-mask pixel
falls in it. A stable argsort on ``(unchanged, tile_index)`` compacts
the changed tiles to the front, and the first ``K`` tiles (static bound
— shapes stay jit-compatible) are gathered with their indices plus the
true changed count. Host side (:func:`sparse_recompose`): paste the
tiles over the caller's original page. Pages whose changed count
exceeds ``K`` are flagged so the caller can fall back to a dense
dispatch (rare: K=64 covers 25% tile coverage at 512^2/TS=32).

Note the reconstruction is bit-exact in the text region (same uint8
bytes the dense path would ship) and *better* than the dense path
outside it: untouched pixels keep the caller's original bytes instead
of a float->bf16->uint8 round trip.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SparsePages(NamedTuple):
    """Device-side packed result (all shapes static).

    tiles: (N, K, TS, TS, 3) uint8 — changed clean-page tiles, first
      ``count`` valid, remainder garbage (unchanged tiles).
    mask_tiles: (N, K, TS, TS) uint8 — text mask for the same tiles.
    index: (N, K) int32 — row-major tile index of each slot.
    count: (N,) int32 — TRUE number of changed tiles (may exceed K:
      overflow — fall back to dense for that page).
    """

    tiles: jax.Array
    mask_tiles: jax.Array
    index: jax.Array
    count: jax.Array


def sparse_pack(
    clean: jax.Array, text_mask2d: jax.Array, *, max_tiles: int = 64, tile: int = 32
) -> SparsePages:
    """Pack (clean (N,H,W,3) float [0,1], text_mask2d (N,H,W)) into
    changed-tile form. Jit-safe: ``max_tiles``/``tile`` are static."""
    n, h, w, _ = clean.shape
    assert h % tile == 0 and w % tile == 0, (h, w, tile)
    th, tw = h // tile, w // tile
    t = th * tw
    k = min(max_tiles, t)

    clean_u8 = jnp.round(
        jnp.clip(clean.astype(jnp.float32), 0.0, 1.0) * 255.0
    ).astype(jnp.uint8)
    tiles = (
        clean_u8.reshape(n, th, tile, tw, tile, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, t, tile, tile, 3)
    )
    mtiles = (
        text_mask2d.reshape(n, th, tile, tw, tile)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n, t, tile, tile)
    )
    changed = jnp.max(mtiles, axis=(2, 3)) > 0  # (N, T)
    # stable compaction: changed tiles keep row-major order at the front
    key = jnp.where(changed, 0, t) + jnp.arange(t, dtype=jnp.int32)
    order = jnp.argsort(key, axis=1)[:, :k].astype(jnp.int32)  # (N, K)
    sel = jnp.take_along_axis(tiles, order[:, :, None, None, None], axis=1)
    selm = jnp.take_along_axis(mtiles, order[:, :, None, None], axis=1)
    count = jnp.sum(changed, axis=1).astype(jnp.int32)
    return SparsePages(sel, selm.astype(jnp.uint8), order, count)


def sparse_recompose(
    pages_uint8: np.ndarray, packed, *, tile: int = 32
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side paste: original uint8 pages + packed tiles ->
    (clean (N,H,W,3) uint8, text_mask (N,H,W,1) uint8, overflow (N,) bool).

    ``packed`` is a :class:`SparsePages` (device or already-numpy).
    Overflowed pages (count > K) are returned as the UNMODIFIED input —
    callers redo those densely.
    """
    tiles, mtiles, index, count = (np.asarray(a) for a in packed)
    n, h, w, _ = pages_uint8.shape
    tw = w // tile
    k = tiles.shape[1]
    clean = np.array(pages_uint8, copy=True)
    mask = np.zeros((n, h, w, 1), np.uint8)
    overflow = count > k
    for i in range(n):
        if overflow[i]:
            continue
        for j in range(int(count[i])):
            r, c = divmod(int(index[i, j]), tw)
            ys, xs = r * tile, c * tile
            clean[i, ys : ys + tile, xs : xs + tile] = tiles[i, j]
            mask[i, ys : ys + tile, xs : xs + tile, 0] = mtiles[i, j]
    return clean, mask, overflow


def sparse_bytes(packed) -> int:
    """Wire bytes of one packed batch (for bench accounting)."""
    return sum(np.asarray(a).nbytes for a in packed)


def sparse_flatten(packed: SparsePages) -> jax.Array:
    """Device-side: pack all four result arrays into ONE (N, B) uint8
    buffer so the host reads back a batch in a single D2H transfer —
    on a tunnel-attached chip each separate read pays the full ~16 ms
    dispatch RTT, which would otherwise swamp the byte savings. Mask
    tiles ride as BITS (8 pixels/byte): they are {0,1} and would
    otherwise be 1/4 of the tile payload."""
    n, k, ts = packed.mask_tiles.shape[:3]
    weights = (jnp.uint32(1) << jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint32)
    mbits = jnp.sum(
        packed.mask_tiles.reshape(n, k, ts, ts // 8, 8).astype(jnp.uint32) * weights,
        axis=-1,
    ).astype(jnp.uint8)
    return jnp.concatenate(
        [
            packed.tiles.reshape(n, -1),
            mbits.reshape(n, -1),
            jax.lax.bitcast_convert_type(packed.index, jnp.uint8).reshape(n, -1),
            jax.lax.bitcast_convert_type(packed.count, jnp.uint8).reshape(n, -1),
        ],
        axis=1,
    )


def sparse_unflatten(buf: np.ndarray, *, max_tiles: int, tile: int) -> SparsePages:
    """Host-side inverse of :func:`sparse_flatten` (numpy views; mask
    bits re-expanded to uint8 pixels)."""
    buf = np.ascontiguousarray(buf)
    n = buf.shape[0]
    k, ts = max_tiles, tile
    o0 = k * ts * ts * 3
    o1 = o0 + k * ts * (ts // 8)
    o2 = o1 + 4 * k
    o3 = o2 + 4
    assert buf.shape[1] == o3, (buf.shape, o3)
    mask_tiles = np.unpackbits(
        buf[:, o0:o1].reshape(n, k, ts, ts // 8), axis=-1, bitorder="little"
    )
    return SparsePages(
        buf[:, :o0].reshape(n, k, ts, ts, 3),
        mask_tiles,
        np.ascontiguousarray(buf[:, o1:o2]).view(np.int32).reshape(n, k),
        np.ascontiguousarray(buf[:, o2:o3]).view(np.int32).reshape(n),
    )
