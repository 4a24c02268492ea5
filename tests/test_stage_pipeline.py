"""2-stage (segment | inpaint) device pipelining == fused single-device
pipeline, on a 2-of-8 virtual-CPU-device 'stage' mesh (SURVEY.md §2.2
PP disposition — cross-device schedule with ICI ppermute handoff)."""

import numpy as np
import pytest

# every test here compiles a full model program: minutes on 1 core
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.models import InpaintUNet, TextSegmenter
from text_segmentation_image_inpainting_tpu.parallel.stage_pipeline import (
    make_stage_mesh,
    pipeline2_run,
    pipeline2_throughput_model,
)
from text_segmentation_image_inpainting_tpu.pipeline import TextRemovalPipeline


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _cpu_pair():
    cpus = jax.devices("cpu")
    assert len(cpus) >= 2
    return cpus[:2]


def test_pipeline2_matches_fused_run(rng):
    pipe = TextRemovalPipeline(
        seg=TextSegmenter(width_mult=0.35, dtype=jnp.float32),
        unet=InpaintUNet(depth=3, dtype=jnp.float32),
        compute_dtype=jnp.float32,
        dilate_radius=1,
    )
    size = 32
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(size, size))
    pages_mb = jnp.asarray(rng.random((3, 2, size, size, 3), dtype=np.float32))

    mesh = make_stage_mesh(_cpu_pair())
    got = pipeline2_run(mesh, pipe, seg_vars, unet_vars, pages_mb)
    assert got.shape == pages_mb.shape

    run = jax.jit(pipe.run)
    for t in range(pages_mb.shape[0]):
        want_clean, _ = run(seg_vars, unet_vars, pages_mb[t])
        np.testing.assert_allclose(
            np.asarray(got[t]), np.asarray(want_clean), rtol=1e-5, atol=1e-5,
            err_msg=f"microbatch {t}",
        )


def test_pipeline2_throughput_model():
    fused, piped = pipeline2_throughput_model(1.0, 1.0, 8)
    assert fused == 16.0 and piped == 9.0  # ~2x for balanced stages, T>>1
    fused, piped = pipeline2_throughput_model(1.0, 3.0, 4)
    assert piped == 4.0 + 9.0  # bound by the slower stage


def test_concurrent_train2_matches_sequential(rng):
    """Training-side 2-stage parallelism: the two stages share no state
    and no gradient path (SURVEY.md C11 — independently trained models),
    so concurrent 2-group training must be EXACTLY the math of running
    each stage's DP step on its own. 4+4 device groups vs the same steps
    run one after the other."""
    from text_segmentation_image_inpainting_tpu.parallel import batch_sharding, replicated
    from text_segmentation_image_inpainting_tpu.parallel.stage_pipeline import (
        concurrent_train2,
        make_group_meshes,
    )
    from text_segmentation_image_inpainting_tpu.train import (
        InpaintTrainConfig,
        SegTrainConfig,
        create_train_state,
        make_inpaint_train_step,
        make_seg_train_step,
    )
    from text_segmentation_image_inpainting_tpu.models import VGG16Features

    size, n = 32, 8
    mesh_seg, mesh_inp = make_group_meshes(jax.devices("cpu"))
    assert mesh_seg.devices.size == 4 and mesh_inp.devices.size == 4

    seg_cfg = SegTrainConfig(image_size=(size, size), width_mult=0.35)
    seg = TextSegmenter(width_mult=seg_cfg.width_mult)
    sbatch = {
        "image": jnp.asarray(rng.random((n, size, size, 3)).astype(np.float32)),
        "mask": jnp.asarray((rng.random((n, size, size, 1)) > 0.8).astype(np.float32)),
    }
    svars = jax.jit(seg.init)(jax.random.key(0), sbatch["image"][:1])

    inp_cfg = InpaintTrainConfig(image_size=(size, size), depth=3)
    unet = InpaintUNet(depth=3)
    vgg = VGG16Features()
    ibatch = {
        "image": jnp.asarray(rng.random((n, size, size, 3)).astype(np.float32)),
        "mask": jnp.asarray((rng.random((n, size, size, 1)) > 0.25).astype(np.float32)),
    }
    uvars = jax.jit(unet.init)(
        jax.random.key(1), ibatch["image"][:1] * ibatch["mask"][:1], ibatch["mask"][:1]
    )
    vgg_vars = jax.jit(vgg.init)(jax.random.key(2), ibatch["image"][:1])

    def run(k_steps):
        sstate = jax.device_put(
            create_train_state(svars, seg.apply, seg_cfg.optimizer), replicated(mesh_seg)
        )
        istate = jax.device_put(
            create_train_state(uvars, unet.apply, inp_cfg.optimizer), replicated(mesh_inp)
        )
        sstep = jax.jit(make_seg_train_step(seg, seg_cfg))
        istep = jax.jit(
            make_inpaint_train_step(unet, inp_cfg, jax.device_put(vgg_vars, replicated(mesh_inp)))
        )
        both = concurrent_train2(sstep, istep)
        sb = {k: jax.device_put(v, batch_sharding(mesh_seg)) for k, v in sbatch.items()}
        ib = {k: jax.device_put(v, batch_sharding(mesh_inp)) for k, v in ibatch.items()}
        outs = []
        for _ in range(k_steps):
            sstate, sm, istate, im = both(sstate, sb, istate, ib)
            outs.append((float(sm["total"]), float(im["total"])))
        return sstate, istate, outs

    # sequential reference: same group meshes, steps dispatched with a
    # sync in between — identical math is the claim
    def run_sequential(k_steps):
        sstate = jax.device_put(
            create_train_state(svars, seg.apply, seg_cfg.optimizer), replicated(mesh_seg)
        )
        istate = jax.device_put(
            create_train_state(uvars, unet.apply, inp_cfg.optimizer), replicated(mesh_inp)
        )
        sstep = jax.jit(make_seg_train_step(seg, seg_cfg))
        istep = jax.jit(
            make_inpaint_train_step(unet, inp_cfg, jax.device_put(vgg_vars, replicated(mesh_inp)))
        )
        sb = {k: jax.device_put(v, batch_sharding(mesh_seg)) for k, v in sbatch.items()}
        ib = {k: jax.device_put(v, batch_sharding(mesh_inp)) for k, v in ibatch.items()}
        outs = []
        for _ in range(k_steps):
            sstate, sm = sstep(sstate, sb)
            jax.block_until_ready(sm["total"])
            istate, im = istep(istate, ib)
            jax.block_until_ready(im["total"])
            outs.append((float(sm["total"]), float(im["total"])))
        return sstate, istate, outs

    s1, i1, o1 = run(3)
    s2, i2, o2 = run_sequential(3)
    assert o1 == o2, (o1, o2)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(i1.params), jax.tree.leaves(i2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
