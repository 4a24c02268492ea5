"""Sparse (changed-tile) serving wire format (pipeline/sparse.py):
pack/flatten/recompose roundtrip, server parity vs the dense path,
overflow fallback, and chunked push-API dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.models import InpaintUNet, TextSegmenter
from text_segmentation_image_inpainting_tpu.pipeline import PageStreamServer, TextRemovalPipeline
from text_segmentation_image_inpainting_tpu.pipeline.sparse import (
    sparse_flatten,
    sparse_pack,
    sparse_recompose,
    sparse_unflatten,
)

SIZE = 32
TILE = 16  # 2x2 = 4 tiles per page


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def small_pipe():
    pipe = TextRemovalPipeline(
        seg=TextSegmenter(width_mult=0.35, dtype=jnp.float32),
        unet=InpaintUNet(depth=3, dtype=jnp.float32),
        compute_dtype=jnp.float32,
        dilate_radius=1,
    )
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(SIZE, SIZE))
    return pipe, seg_vars, unet_vars


def test_sparse_pack_roundtrip(rng):
    """flatten -> unflatten -> recompose reproduces changed tiles
    bit-exactly and leaves untouched tiles as the caller's bytes."""
    n = 3
    clean = rng.random((n, SIZE, SIZE, 3)).astype(np.float32)
    # page 0: one changed tile; page 1: none; page 2: all four
    mask2d = np.zeros((n, SIZE, SIZE), np.float32)
    mask2d[0, :TILE, TILE:] = 1.0
    mask2d[2] = 1.0
    inputs = rng.integers(0, 256, (n, SIZE, SIZE, 3), dtype=np.uint8)

    packed = sparse_pack(jnp.asarray(clean), jnp.asarray(mask2d), max_tiles=4, tile=TILE)
    buf = np.asarray(sparse_flatten(packed))
    unpacked = sparse_unflatten(buf, max_tiles=4, tile=TILE)
    np.testing.assert_array_equal(np.asarray(packed.count), unpacked.count)
    got, gmask, overflow = sparse_recompose(inputs, unpacked, tile=TILE)

    assert not overflow.any()
    clean_u8 = np.round(np.clip(clean, 0, 1) * 255).astype(np.uint8)
    # tile-level region: expand per-tile changed flags to pixels
    tflags = mask2d.reshape(n, 2, TILE, 2, TILE).max(axis=(2, 4))
    region = np.kron(tflags, np.ones((TILE, TILE))).astype(bool)
    np.testing.assert_array_equal(got[region], clean_u8[region])
    np.testing.assert_array_equal(got[~region], inputs[~region])
    np.testing.assert_array_equal(gmask[..., 0], mask2d.astype(np.uint8))
    assert list(unpacked.count) == [1, 0, 4]


def test_sparse_pack_counts_overflow(rng):
    clean = rng.random((1, SIZE, SIZE, 3)).astype(np.float32)
    mask2d = np.ones((1, SIZE, SIZE), np.float32)
    packed = sparse_pack(jnp.asarray(clean), jnp.asarray(mask2d), max_tiles=2, tile=TILE)
    inputs = np.zeros((1, SIZE, SIZE, 3), np.uint8)
    got, _, overflow = sparse_recompose(inputs, packed, tile=TILE)
    assert overflow.all()
    np.testing.assert_array_equal(got, inputs)  # untouched: caller redoes densely


@pytest.mark.slow  # jits the full server program: minutes on 1 core
def test_sparse_server_matches_dense(rng):
    """Sparse serving == dense serving on the text mask everywhere and on
    the clean page inside every mask-touched tile; outside those tiles the
    sparse path preserves the caller's exact input bytes."""
    pipe, seg_vars, unet_vars = small_pipe()
    batches = [rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8) for _ in range(4)]

    dense = list(
        PageStreamServer(pipe, seg_vars, unet_vars, depth=2).serve(iter(batches))
    )
    sparse = list(
        PageStreamServer(
            pipe, seg_vars, unet_vars, depth=2, sparse_tiles=4, tile=TILE
        ).serve(iter(batches))
    )
    assert len(dense) == len(sparse) == 4
    for pages, (dc, dm), (sc, sm) in zip(batches, dense, sparse):
        np.testing.assert_array_equal(sm, dm)
        n = pages.shape[0]
        tflags = dm[..., 0].reshape(n, 2, TILE, 2, TILE).max(axis=(2, 4))
        region = np.kron(tflags, np.ones((TILE, TILE))).astype(bool)
        np.testing.assert_array_equal(sc[region], dc[region])
        np.testing.assert_array_equal(sc[~region], pages[~region])


@pytest.mark.slow  # jits the full server program: minutes on 1 core
def test_sparse_server_overflow_falls_back_dense(rng):
    """With a 1-tile budget every page overflows -> results == dense."""
    pipe, seg_vars, unet_vars = small_pipe()
    batches = [rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8) for _ in range(2)]
    dense = list(PageStreamServer(pipe, seg_vars, unet_vars).serve(iter(batches)))
    server = PageStreamServer(pipe, seg_vars, unet_vars, sparse_tiles=1, tile=TILE)
    sparse = list(server.serve(iter(batches)))
    for (dc, dm), (sc, sm) in zip(dense, sparse):
        # pages with more than 1 changed tile blew the budget and must be
        # byte-identical to the dense path (fallback redispatch)
        for i in range(dm.shape[0]):
            n_changed = int(
                (dm[i, ..., 0].reshape(2, TILE, 2, TILE).max(axis=(1, 3)) > 0).sum()
            )
            if n_changed > 1:
                np.testing.assert_array_equal(sc[i], dc[i])
                np.testing.assert_array_equal(sm[i], dm[i])


@pytest.mark.slow  # jits the full server program: minutes on 1 core
def test_submit_chunked_matches_per_batch(rng):
    """chunk=2 push API: 5 submits -> 2 megabatch dispatches + flushed
    tail; results equal the unchunked server's, in order."""
    pipe, seg_vars, unet_vars = small_pipe()
    batches = [rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8) for _ in range(5)]

    plain = PageStreamServer(pipe, seg_vars, unet_vars)
    for b in batches:
        plain.submit(b)
    want = list(plain.drain())

    chunked = PageStreamServer(pipe, seg_vars, unet_vars, chunk=2)
    for b in batches:
        chunked.submit(b)
    assert len(chunked._inflight) == 2  # 2 full chunks dispatched, 1 pending
    got = list(chunked.drain())

    assert len(got) == len(want) == 5
    for (wc, wm), (gc, gm) in zip(want, got):
        np.testing.assert_array_equal(gc, wc)
        np.testing.assert_array_equal(gm, wm)


@pytest.mark.slow  # jits the full server program: minutes on 1 core
def test_submit_chunked_sparse(rng):
    """Sparse + chunked submit compose."""
    pipe, seg_vars, unet_vars = small_pipe()
    batches = [rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8) for _ in range(3)]
    dense = PageStreamServer(pipe, seg_vars, unet_vars)
    for b in batches:
        dense.submit(b)
    want = list(dense.drain())

    server = PageStreamServer(pipe, seg_vars, unet_vars, chunk=2, sparse_tiles=4, tile=TILE)
    for b in batches:
        server.submit(b)
    got = list(server.drain())
    assert len(got) == 3
    for pages, (dc, dm), (sc, sm) in zip(batches, want, got):
        np.testing.assert_array_equal(sm, dm)
        n = pages.shape[0]
        tflags = dm[..., 0].reshape(n, 2, TILE, 2, TILE).max(axis=(2, 4))
        region = np.kron(tflags, np.ones((TILE, TILE))).astype(bool)
        np.testing.assert_array_equal(sc[region], dc[region])
        np.testing.assert_array_equal(sc[~region], pages[~region])


@pytest.mark.slow  # jits the full server program: minutes on 1 core
def test_sparse_budget_larger_than_page_tile_count(rng):
    """sparse_tiles bigger than the page's tile count (e.g. the K=96
    default serving 32² test pages with 4 tiles): sparse_pack clamps its
    slot count to the page, so the server must unflatten with the same
    clamp instead of asserting on the buffer width."""
    pipe, seg_vars, unet_vars = small_pipe()
    batches = [rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8) for _ in range(2)]
    dense = list(PageStreamServer(pipe, seg_vars, unet_vars).serve(iter(batches)))
    sparse = list(
        PageStreamServer(
            pipe, seg_vars, unet_vars, sparse_tiles=9, tile=TILE
        ).serve(iter(batches))
    )
    for pages, (dc, dm), (sc, sm) in zip(batches, dense, sparse):
        np.testing.assert_array_equal(sm, dm)
        n = pages.shape[0]
        tflags = dm[..., 0].reshape(n, 2, TILE, 2, TILE).max(axis=(2, 4))
        region = np.kron(tflags, np.ones((TILE, TILE))).astype(bool)
        np.testing.assert_array_equal(sc[region], dc[region])
        np.testing.assert_array_equal(sc[~region], pages[~region])


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_sparse_server_rejects_unpackable_tile():
    pipe, seg_vars, unet_vars = small_pipe()
    with pytest.raises(ValueError, match="tile % 8"):
        PageStreamServer(pipe, seg_vars, unet_vars, sparse_tiles=4, tile=20)


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_adaptive_budget_policy():
    """The per-dispatch tile budget tracks observed demand: power-of-two
    levels, 25% headroom over the last 8 batches, capped at sparse_tiles."""
    pipe, seg_vars, unet_vars = small_pipe()
    server = PageStreamServer(pipe, seg_vars, unet_vars, sparse_tiles=96, tile=TILE)
    assert server._k_levels == [16, 32, 64, 96]
    assert server._k_next == 96  # first dispatch is safe (max budget)
    server._observe_counts(np.array([3, 10]))
    assert server._k_next == 16  # 10*1.25+1 = 13 -> level 16
    server._observe_counts(np.array([40]))
    assert server._k_next == 64  # 40*1.25+1 = 51 -> level 64
    server._observe_counts(np.array([200]))
    assert server._k_next == 96  # demand above the cap clamps to max
    for _ in range(8):  # the busy batches age out of the window
        server._observe_counts(np.array([2]))
    assert server._k_next == 16


@pytest.mark.slow  # jits the full server program: minutes on 1 core
def test_sparse_adaptive_undershoot_retries_and_matches_dense(rng):
    """An undershot budget (forced k=1 on multi-tile pages) must retry on
    the sparse wire at the max budget and still match the dense path."""
    pipe, seg_vars, unet_vars = small_pipe()
    batches = [rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8) for _ in range(3)]
    dense = list(PageStreamServer(pipe, seg_vars, unet_vars).serve(iter(batches)))
    server = PageStreamServer(pipe, seg_vars, unet_vars, sparse_tiles=4, tile=TILE)
    server._k_next = 1  # force undershoot on the first dispatch
    sparse = list(server.serve(iter(batches)))
    assert server.wire_bytes > 0
    for pages, (dc, dm), (sc, sm) in zip(batches, dense, sparse):
        np.testing.assert_array_equal(sm, dm)
        n = pages.shape[0]
        tflags = dm[..., 0].reshape(n, 2, TILE, 2, TILE).max(axis=(2, 4))
        region = np.kron(tflags, np.ones((TILE, TILE))).astype(bool)
        np.testing.assert_array_equal(sc[region], dc[region])
        np.testing.assert_array_equal(sc[~region], pages[~region])
