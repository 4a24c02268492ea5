"""Gradient accumulation + multi-step dispatch.

Accumulation spec: k microbatches, mean grads, ONE optimizer update.
With the batch built from IDENTICAL halves, per-microbatch BN statistics
equal the big-batch statistics, so the accumulated step must reproduce
the plain step's parameters exactly (up to the loss epsilons).

Multi-step spec: ``make_multi_step`` scans the SAME train_step program,
so k stacked batches through one dispatch must match k sequential
dispatches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_segmentation_image_inpainting_tpu.models import (
    InpaintUNet,
    TextSegmenter,
    VGG16Features,
)
from text_segmentation_image_inpainting_tpu.train import (
    InpaintTrainConfig,
    OptimizerConfig,
    SegTrainConfig,
    create_train_state,
    make_inpaint_train_step,
    make_multi_step,
    make_seg_train_step,
    stack_host_batches,
)
from text_segmentation_image_inpainting_tpu.train.multistep import (
    clamp_steps_per_dispatch,
)

# full train-step jit compiles (x accumulation variants) take minutes on
# the 1-core host
pytestmark = pytest.mark.slow

SIZE = 32

# Exactness tests (accumulated == big-batch) run in FLOAT64 with plain
# SGD. Both knobs are load-bearing:
#  * f64: the microbatch and big-batch forwards are different XLA
#    programs, and BatchNorm's backward amplifies their ulp-level
#    reassociation differences by the conditioning of 1/sqrt(var) at
#    every layer — measured fp32 grad diffs reach 3e-2 on O(0.1) grads
#    for unlucky data draws, while the same comparison in f64 agrees to
#    4.6e-13. The invariant is exact; fp32 isn't precise enough to
#    witness it elementwise.
#  * SGD: under Adam the update lr*m/(sqrt(v)+eps) turns even tiny
#    gradient diffs into ~2*lr param diffs wherever grads are near
#    zero. With SGD, param diff == lr * grad diff.
SGD = OptimizerConfig(kind="sgd")


def _seg_setup(rng, dtype=jnp.float32, **cfg_kw):
    cfg = SegTrainConfig(image_size=(SIZE, SIZE), width_mult=0.35, **cfg_kw)
    model = TextSegmenter(width_mult=0.35, dtype=dtype)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), dtype))
    variables = jax.tree.map(lambda x: x.astype(dtype), variables)
    state = create_train_state(variables, model.apply, cfg.optimizer)
    return model, cfg, state


def _seg_batch(rng, n):
    return {
        "image": jnp.asarray(rng.random((n, SIZE, SIZE, 3), dtype=np.float32)),
        "mask": jnp.asarray((rng.random((n, SIZE, SIZE, 1)) > 0.8).astype(np.float32)),
    }


def _dup(batch):
    # sample-interleaved duplication [a,a,b,b]: accumulate_grads uses a
    # STRIDED microbatch split (DP-friendly), so microbatch j of this
    # batch is exactly the original [a,b] — per-microbatch BN statistics
    # equal the big-batch statistics and the exactness invariant holds.
    return jax.tree.map(lambda x: jnp.repeat(x, 2, axis=0), batch)


def test_seg_grad_accum_matches_bigbatch_on_duplicated_halves(rng):
    with jax.enable_x64():
        model, cfg1, state = _seg_setup(rng, dtype=jnp.float64, optimizer=SGD)
        _, cfg2, _ = _seg_setup(rng, dtype=jnp.float64, grad_accum=2, optimizer=SGD)
        batch = jax.tree.map(
            lambda x: x.astype(jnp.float64), _dup(_seg_batch(rng, 2))
        )

        s1, m1 = jax.jit(make_seg_train_step(model, cfg1))(state, batch)
        s2, m2 = jax.jit(make_seg_train_step(model, cfg2))(state, batch)

        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11),
            s1.params,
            s2.params,
        )
        # loss terms are microbatch means of identical halves == big-batch value
        np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=1e-9)


def test_seg_grad_accum_trains(rng):
    """Accumulated steps on distinct microbatches reduce the loss."""
    model, cfg, state = _seg_setup(rng, grad_accum=2)
    step = jax.jit(make_seg_train_step(model, cfg))
    batch = _seg_batch(rng, 4)
    _, m0 = step(state, batch)
    for _ in range(4):
        state, m = step(state, batch)
    assert float(m["total"]) < float(m0["total"])


def test_inpaint_grad_accum_matches_bigbatch_on_duplicated_halves(rng):
    with jax.enable_x64():
        f64 = jnp.float64
        from text_segmentation_image_inpainting_tpu.losses.inpainting import (
            InpaintLossConfig,
        )

        loss64 = InpaintLossConfig(vgg_dtype="float64")
        cfg1 = InpaintTrainConfig(
            image_size=(SIZE, SIZE), depth=3, optimizer=SGD, loss=loss64
        )
        cfg2 = InpaintTrainConfig(
            image_size=(SIZE, SIZE), depth=3, grad_accum=2, optimizer=SGD, loss=loss64
        )
        model = InpaintUNet(depth=3, dtype=f64)
        vgg = VGG16Features(dtype=f64)
        half = {
            "image": jnp.asarray(rng.random((2, SIZE, SIZE, 3)), f64),
            "mask": jnp.asarray((rng.random((2, SIZE, SIZE, 1)) > 0.3), f64),
        }
        batch = _dup(half)
        variables = model.init(
            jax.random.key(1), batch["image"][:1] * batch["mask"][:1], batch["mask"][:1]
        )
        variables = jax.tree.map(lambda x: x.astype(f64), variables)
        vgg_vars = jax.tree.map(
            lambda x: x.astype(f64), vgg.init(jax.random.key(2), batch["image"][:1])
        )
        state = create_train_state(variables, model.apply, cfg1.optimizer)

        s1, m1 = jax.jit(make_inpaint_train_step(model, cfg1, vgg_vars))(state, batch)
        s2, m2 = jax.jit(make_inpaint_train_step(model, cfg2, vgg_vars))(state, batch)

        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11),
            s1.params,
            s2.params,
        )
        np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=1e-9)


def test_multi_step_matches_sequential(rng):
    model, cfg, state = _seg_setup(rng, optimizer=SGD)
    step = make_seg_train_step(model, cfg)
    batches = [_seg_batch(rng, 2) for _ in range(3)]

    seq_state = state
    seq_metrics = []
    jstep = jax.jit(step)
    for b in batches:
        seq_state, m = jstep(seq_state, b)
        seq_metrics.append(m)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    multi_state, multi_metrics = jax.jit(make_multi_step(step))(state, stacked)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        seq_state.params,
        multi_state.params,
    )
    assert int(multi_state.step) == int(seq_state.step) == 3
    # metrics come back stacked (k,) in call order
    np.testing.assert_allclose(
        np.asarray(multi_metrics["total"]),
        np.asarray([float(m["total"]) for m in seq_metrics]),
        rtol=1e-6,
    )


def test_stack_host_batches_groups_and_drops_tail():
    batches = [{"x": np.full((2, 3), i, np.float32)} for i in range(5)]
    out = list(stack_host_batches(iter(batches), 2))
    assert len(out) == 2  # the odd tail batch is dropped, not mis-shaped
    assert out[0]["x"].shape == (2, 2, 3)
    np.testing.assert_array_equal(out[1]["x"][1], batches[3]["x"])


def test_clamp_steps_per_dispatch():
    assert clamp_steps_per_dispatch(8, 50, 500) == 5  # largest divisor <= 8
    assert clamp_steps_per_dispatch(10, 50, 500) == 10
    assert clamp_steps_per_dispatch(3, 50, 500) == 2
    assert clamp_steps_per_dispatch(7, 50, 500) == 5
    assert clamp_steps_per_dispatch(1, 50, 500) == 1
    assert clamp_steps_per_dispatch(4, 7, 500) == 1


def test_grad_accum_must_divide_batch(rng):
    model, cfg, state = _seg_setup(rng, grad_accum=3)
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(make_seg_train_step(model, cfg))(state, _seg_batch(rng, 4))


def test_run_seg_cli_multistep_smoke(tmp_path):
    """The CLI wires spd + grad-accum end to end (tiny shapes)."""
    from text_segmentation_image_inpainting_tpu.train.run_seg import main

    state = main(
        [
            "--steps", "4",
            "--batch-size", "4",
            "--image-size", str(SIZE),
            "--width-mult", "0.35",
            "--steps-per-dispatch", "2",
            "--grad-accum", "2",
            "--log-every", "2",
            "--ckpt-every", "4",
            "--val-batches", "1",
            "--no-bf16",
            "--ckpt-dir", str(tmp_path / "ckpt"),
        ]
    )
    assert int(state.step) == 4
