"""Training-step smoke (loss decreases), DP-over-mesh tests on the fake
8-device CPU mesh, and fused-pipeline integration (SURVEY.md section 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.losses.inpainting import InpaintLossConfig
from text_segmentation_image_inpainting_tpu.models import InpaintUNet, TextSegmenter, VGG16Features
from text_segmentation_image_inpainting_tpu.parallel import batch_sharding, make_mesh, shard_batch
from text_segmentation_image_inpainting_tpu.pipeline import TextRemovalPipeline
from text_segmentation_image_inpainting_tpu.train import (
    InpaintTrainConfig,
    SegTrainConfig,
    create_train_state,
    make_inpaint_train_step,
    make_seg_train_step,
)
from text_segmentation_image_inpainting_tpu.train.config import OptimizerConfig
from text_segmentation_image_inpainting_tpu.train.metrics import iou, psnr, ssim
from text_segmentation_image_inpainting_tpu.train.state import freeze_mask_for


SIZE = 32


def make_seg_batch(rng, n=8):
    img = rng.random((n, SIZE, SIZE, 3), dtype=np.float32)
    mask = (rng.random((n, SIZE, SIZE, 1)) > 0.8).astype(np.float32)
    return {"image": jnp.asarray(img), "mask": jnp.asarray(mask)}


def make_inpaint_batch(rng, n=8):
    img = rng.random((n, SIZE, SIZE, 3), dtype=np.float32)
    mask = (rng.random((n, SIZE, SIZE, 1)) > 0.25).astype(np.float32)
    return {"image": jnp.asarray(img), "mask": jnp.asarray(mask)}


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_seg_train_smoke_loss_decreases(rng):
    cfg = SegTrainConfig(
        image_size=(SIZE, SIZE), batch_size=8, width_mult=0.35,
        optimizer=OptimizerConfig(learning_rate=1e-2),
    )
    model = TextSegmenter(width_mult=cfg.width_mult)
    batch = make_seg_batch(rng)
    variables = jax.jit(model.init)(jax.random.key(0), batch["image"])
    state = create_train_state(variables, model.apply, cfg.optimizer)
    step = jax.jit(make_seg_train_step(model, cfg))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
    assert int(state.step) == 5


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_seg_train_frozen_encoder(rng):
    cfg = SegTrainConfig(image_size=(SIZE, SIZE), width_mult=0.35)
    model = TextSegmenter(width_mult=cfg.width_mult)
    batch = make_seg_batch(rng, n=4)
    variables = jax.jit(model.init)(jax.random.key(0), batch["image"])
    mask = freeze_mask_for(variables["params"], "encoder")
    state = create_train_state(variables, model.apply, cfg.optimizer, frozen_mask=mask)
    step = jax.jit(make_seg_train_step(model, cfg))
    new_state, _ = step(state, batch)
    # encoder params unchanged, decoder params changed
    old_enc = jax.tree.leaves(state.params["encoder"])
    new_enc = jax.tree.leaves(new_state.params["encoder"])
    assert all(np.array_equal(a, b) for a, b in zip(old_enc, new_enc))
    old_dec = np.concatenate([np.ravel(x) for x in jax.tree.leaves(state.params["decoder"])])
    new_dec = np.concatenate([np.ravel(x) for x in jax.tree.leaves(new_state.params["decoder"])])
    assert not np.array_equal(old_dec, new_dec)


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_inpaint_train_smoke_loss_decreases(rng):
    cfg = InpaintTrainConfig(
        image_size=(SIZE, SIZE), depth=3,
        optimizer=OptimizerConfig(learning_rate=1e-3),
        loss=InpaintLossConfig(),
    )
    model = InpaintUNet(depth=cfg.depth)
    vgg = VGG16Features()
    batch = make_inpaint_batch(rng)
    variables = jax.jit(model.init)(
        jax.random.key(0), batch["image"] * batch["mask"], batch["mask"]
    )
    vgg_vars = jax.jit(vgg.init)(jax.random.key(1), batch["image"])
    state = create_train_state(variables, model.apply, cfg.optimizer)
    step = jax.jit(make_inpaint_train_step(model, cfg, vgg_vars))
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_seg_train_dp_matches_single_device(rng):
    """DP over the 8-device mesh must produce the same params as
    single-device training on the same global batch (SPMD correctness)."""
    cfg = SegTrainConfig(image_size=(SIZE, SIZE), width_mult=0.35)
    model = TextSegmenter(width_mult=cfg.width_mult)
    batch = make_seg_batch(rng, n=8)
    variables = jax.jit(model.init)(jax.random.key(0), batch["image"])
    step_fn = make_seg_train_step(model, cfg)

    state1 = create_train_state(variables, model.apply, cfg.optimizer)
    state1, m1 = jax.jit(step_fn)(state1, batch)

    mesh = make_mesh(8, platform="cpu")
    sharded = shard_batch(mesh, batch)
    assert sharded["image"].sharding.is_equivalent_to(batch_sharding(mesh), 4)
    state8 = create_train_state(variables, model.apply, cfg.optimizer)
    state8, m8 = jax.jit(step_fn)(state8, sharded)

    np.testing.assert_allclose(float(m1["total"]), float(m8["total"]), rtol=1e-5)
    l1 = jax.tree.leaves(state1.params)
    l8 = jax.tree.leaves(state8.params)
    for a, b in zip(l1, l8):
        # tolerance: cross-device reduction order perturbs grads, and Adam
        # amplifies that to +-lr on near-zero second moments; the tight
        # rtol on the loss above is the real SPMD-correctness gate.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-3)


def test_pipeline_end_to_end(rng):
    pipe = TextRemovalPipeline(
        seg=TextSegmenter(width_mult=0.35, dtype=jnp.float32),
        unet=InpaintUNet(depth=3, dtype=jnp.float32),
        compute_dtype=jnp.float32,
        dilate_radius=1,
    )
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(SIZE, SIZE))
    pages = jnp.asarray(rng.random((2, SIZE, SIZE, 3), dtype=np.float32))
    clean, mask = jax.jit(pipe.run)(seg_vars, unet_vars, pages)
    assert clean.shape == pages.shape and mask.shape == (2, SIZE, SIZE, 1)
    m = np.asarray(mask)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    # outside the (dilated) text mask the page must be untouched
    np.testing.assert_allclose(
        np.asarray(clean) * (1 - m), np.asarray(pages) * (1 - m), atol=1e-6
    )
    assert np.isfinite(np.asarray(clean)).all()


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_pipeline_dp_sharded(rng):
    mesh = make_mesh(8, platform="cpu")
    pipe = TextRemovalPipeline(
        seg=TextSegmenter(width_mult=0.35, dtype=jnp.float32),
        unet=InpaintUNet(depth=3, dtype=jnp.float32),
        compute_dtype=jnp.float32,
    )
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(SIZE, SIZE))
    from text_segmentation_image_inpainting_tpu.parallel import replicated

    seg_vars, unet_vars = jax.device_put((seg_vars, unet_vars), replicated(mesh))
    pages = jnp.asarray(rng.random((8, SIZE, SIZE, 3), dtype=np.float32))
    sharded = jax.device_put(pages, batch_sharding(mesh))
    clean, mask = jax.jit(pipe.run)(seg_vars, unet_vars, sharded)
    assert clean.shape == (8, SIZE, SIZE, 3)
    # output stays sharded over the data axis (no implicit gather)
    assert not clean.sharding.is_fully_replicated
    assert np.isfinite(np.asarray(clean)).all()


def test_metrics_sanity(rng):
    a = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    assert float(psnr(a, a)) > 100
    assert abs(float(ssim(a, a)) - 1.0) < 1e-5
    b = jnp.clip(a + 0.1, 0, 1)
    assert float(psnr(a, b)) < 30
    m = jnp.asarray((rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32))
    assert abs(float(iou(m, m)) - 1.0) < 1e-5
    assert float(iou(m, 1 - m)) < 1e-5


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_pipeline_arbitrary_page_size(rng):
    """Non-multiple page sizes run through the fused pipeline via
    edge-pad + crop (the U-Net asserts divisibility by 2**depth)."""
    pipe = TextRemovalPipeline(
        seg=TextSegmenter(width_mult=0.35, dtype=jnp.float32),
        unet=InpaintUNet(depth=3, dtype=jnp.float32),
        compute_dtype=jnp.float32,
        dilate_radius=1,
    )
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(SIZE, SIZE))
    h, w = 37, 45  # deliberately not divisible by 2**3
    pages = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
    clean, mask = jax.jit(pipe.run)(seg_vars, unet_vars, pages)
    assert clean.shape == (1, h, w, 3) and mask.shape == (1, h, w, 1)
    assert np.isfinite(np.asarray(clean)).all()
    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(clean) * (1 - m), np.asarray(pages) * (1 - m), atol=1e-6
    )
    # inpaint() path with an external mask at odd size
    out = jax.jit(pipe.inpaint)(unet_vars, pages, mask)
    assert out.shape == (1, h, w, 3)
    # segment() path
    sm = jax.jit(lambda v, p: pipe.segment(v, p, dilate=False))(seg_vars, pages)
    assert sm.shape == (1, h, w, 1)


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_inpaint_freeze_enc_bn_selective(rng):
    """freeze_bn fine-tune: encoder BN running stats stay fixed while
    decoder BN stats keep updating (Liu et al. phase 2)."""
    cfg = InpaintTrainConfig(
        image_size=(SIZE, SIZE), depth=3, freeze_bn=True,
        optimizer=OptimizerConfig(learning_rate=1e-3),
        loss=InpaintLossConfig(perceptual=0.0, style=0.0),
    )
    model = InpaintUNet(depth=cfg.depth)
    batch = make_inpaint_batch(rng)
    variables = jax.jit(model.init)(
        jax.random.key(0), batch["image"] * batch["mask"], batch["mask"]
    )
    vgg = VGG16Features()
    vgg_vars = jax.jit(vgg.init)(jax.random.key(1), batch["image"][:1])
    state = create_train_state(variables, model.apply, cfg.optimizer)
    step = jax.jit(make_inpaint_train_step(model, cfg, vgg_vars))
    before = jax.tree.map(np.asarray, state.batch_stats)
    state, _ = step(state, batch)
    after = jax.tree.map(np.asarray, state.batch_stats)
    enc_keys = [k for k in before if k.startswith("enc")]
    dec_keys = [k for k in before if k.startswith("dec")]
    assert enc_keys and dec_keys
    for k in enc_keys:
        np.testing.assert_array_equal(before[k]["mean"], after[k]["mean"])
    changed = any(
        not np.array_equal(before[k]["mean"], after[k]["mean"]) for k in dec_keys
    )
    assert changed, "decoder BN stats must keep updating under freeze_bn"


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_page_stream_server_matches_direct_run(rng):
    """Pipelined streaming serve == per-batch jitted run, order preserved."""
    from text_segmentation_image_inpainting_tpu.pipeline import PageStreamServer

    pipe = TextRemovalPipeline(
        seg=TextSegmenter(width_mult=0.35, dtype=jnp.float32),
        unet=InpaintUNet(depth=3, dtype=jnp.float32),
        compute_dtype=jnp.float32,
        dilate_radius=1,
    )
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(SIZE, SIZE))
    batches = [rng.random((2, SIZE, SIZE, 3), dtype=np.float32) for _ in range(5)]

    server = PageStreamServer(pipe, seg_vars, unet_vars, depth=2)
    got = list(server.serve(iter(batches)))
    assert len(got) == 5

    run = jax.jit(pipe.run)
    for pages, (clean_u8, mask_u8) in zip(batches, got):
        want_clean, want_mask = run(seg_vars, unet_vars, jnp.asarray(pages))
        want_u8 = np.round(np.clip(np.asarray(want_clean), 0, 1) * 255).astype(np.uint8)
        assert clean_u8.dtype == np.uint8 and clean_u8.shape == pages.shape
        np.testing.assert_array_equal(clean_u8, want_u8)
        np.testing.assert_array_equal(mask_u8, np.asarray(want_mask).astype(np.uint8))


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_page_stream_server_submit_collect(rng):
    from text_segmentation_image_inpainting_tpu.pipeline import PageStreamServer

    pipe = TextRemovalPipeline(
        seg=TextSegmenter(width_mult=0.35, dtype=jnp.float32),
        unet=InpaintUNet(depth=3, dtype=jnp.float32),
        compute_dtype=jnp.float32,
    )
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(SIZE, SIZE))
    server = PageStreamServer(pipe, seg_vars, unet_vars, depth=1, output_uint8=False)
    assert server.collect() is None and not server.ready()
    a = rng.random((1, SIZE, SIZE, 3), dtype=np.float32)
    b = rng.random((1, SIZE, SIZE, 3), dtype=np.float32)
    server.submit(a)
    assert not server.ready()  # depth=1: one in flight, keep pipelining
    server.submit(b)
    assert server.ready()
    outs = list(server.drain())
    assert len(outs) == 2 and not server.ready()
    want, _ = jax.jit(pipe.run)(seg_vars, unet_vars, jnp.asarray(a))
    np.testing.assert_allclose(outs[0][0], np.asarray(want), atol=1e-6)


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_page_stream_server_uint8_ingest(rng):
    """uint8 pages (the cheap-H2D wire format) == float pages / 255."""
    from text_segmentation_image_inpainting_tpu.pipeline import PageStreamServer

    pipe = TextRemovalPipeline(
        seg=TextSegmenter(width_mult=0.35, dtype=jnp.float32),
        unet=InpaintUNet(depth=3, dtype=jnp.float32),
        compute_dtype=jnp.float32,
    )
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(SIZE, SIZE))
    u8 = (rng.random((2, SIZE, SIZE, 3)) * 255).astype(np.uint8)
    server = PageStreamServer(pipe, seg_vars, unet_vars, depth=1)
    server.submit(u8)
    clean_u8, _ = server.collect()
    want, _ = jax.jit(pipe.run)(
        seg_vars, unet_vars, jnp.asarray(u8, jnp.float32) / 255.0
    )
    want_u8 = np.round(np.clip(np.asarray(want), 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(clean_u8, want_u8)


@pytest.mark.slow  # 30s+ of jit compile on the 1-core host
def test_page_stream_server_chunked_matches_direct(rng):
    """chunk=2 megabatch dispatch == per-batch results, order preserved,
    including a tail batch short of a full chunk."""
    from text_segmentation_image_inpainting_tpu.pipeline import PageStreamServer

    pipe = TextRemovalPipeline(
        seg=TextSegmenter(width_mult=0.35, dtype=jnp.float32),
        unet=InpaintUNet(depth=3, dtype=jnp.float32),
        compute_dtype=jnp.float32,
        dilate_radius=1,
    )
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(SIZE, SIZE))
    batches = [
        (rng.random((2, SIZE, SIZE, 3)) * 255).astype(np.uint8) for _ in range(5)
    ]
    server = PageStreamServer(pipe, seg_vars, unet_vars, depth=1, chunk=2)
    got = list(server.serve(iter(batches)))
    assert len(got) == 5
    run = jax.jit(pipe.run)
    for pages_u8, (clean_u8, mask_u8) in zip(batches, got):
        want_clean, want_mask = run(
            seg_vars, unet_vars, jnp.asarray(pages_u8, jnp.float32) / 255.0
        )
        want_u8 = np.round(np.clip(np.asarray(want_clean), 0, 1) * 255).astype(np.uint8)
        np.testing.assert_array_equal(clean_u8, want_u8)
        np.testing.assert_array_equal(mask_u8, np.asarray(want_mask).astype(np.uint8))
