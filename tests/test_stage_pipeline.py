"""2-stage (segment | inpaint) device pipelining == fused single-device
pipeline, on a 2-of-8 virtual-CPU-device 'stage' mesh (SURVEY.md §2.2
PP disposition — cross-device schedule with ICI ppermute handoff)."""

import numpy as np
import pytest

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
