"""Optimizer assembly, checkpoint manager, profiling utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from text_segmentation_image_inpainting_tpu.train.config import OptimizerConfig
from text_segmentation_image_inpainting_tpu.train.state import make_optimizer
from text_segmentation_image_inpainting_tpu.utils.profiling import checked, timed


@pytest.mark.parametrize(
    "cfg",
    [
        OptimizerConfig(),
        OptimizerConfig(amsgrad=True),
        OptimizerConfig(weight_decay=1e-4),
        OptimizerConfig(grad_clip_norm=1.0),
        OptimizerConfig(warmup_steps=5),
        OptimizerConfig(restart_period=10, warmup_steps=2),
    ],
    ids=["adam", "amsgrad", "adamw", "clip", "warmup", "sgdr"],
)
def test_make_optimizer_variants_step(cfg):
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones((4, 4))}
    state = opt.init(params)
    grads = {"w": jnp.full((4, 4), 0.5)}
    updates, state = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(new["w"])).all()
    if cfg.warmup_steps and not cfg.restart_period:
        # first warmup step has ~zero LR
        np.testing.assert_allclose(np.asarray(updates["w"]), 0.0, atol=1e-9)


def test_grad_clip_bounds_update_norm():
    cfg = OptimizerConfig(grad_clip_norm=1e-3, learning_rate=1.0)
    opt = make_optimizer(cfg)
    params = {"w": jnp.zeros((8,))}
    state = opt.init(params)
    huge = {"w": jnp.full((8,), 1e6)}
    updates, _ = opt.update(huge, state, params)
    # adam normalizes, but clip must have fired before adam without NaN
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_checked_catches_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    err, out = jax.jit(checked(bad))(jnp.asarray(-1.0))
    with pytest.raises(Exception):
        err.throw()
    err2, out2 = jax.jit(checked(bad))(jnp.asarray(1.0))
    err2.throw()  # no error
    assert float(out2) == 0.0


def test_timed_returns_mean_and_result():
    f = jax.jit(lambda x: x * 2)
    dt, out = timed(f, jnp.ones((8, 8)), iters=2, warmup=1)
    assert dt > 0
    assert float(out[0, 0]) == 2.0


def test_tolerant_merge_warns_on_zero_match(caplog):
    """A checkpoint whose layout doesn't match at all must warn loudly
    (it would otherwise silently return the random-init template)."""
    import logging

    from text_segmentation_image_inpainting_tpu.models.base import tolerant_merge

    template = {"params": {"conv": {"kernel": np.zeros((3, 3, 1, 4), np.float32)}}}
    loaded = {"totally": {"different": np.zeros((5,), np.float32)}}
    with caplog.at_level(logging.WARNING):
        merged, report = tolerant_merge(template, loaded)
    assert not report["used"]
    assert any("NO keys matched" in r.message for r in caplog.records)


def test_ssim_bounded_on_near_perfect_reconstruction(rng):
    """SSIM(x, x) == 1 and SSIM never exceeds 1 + eps, including on flat
    page-like regions where the variance terms cancel catastrophically
    (the TPU default-precision conv inflated this past 1.02 — metrics
    now force HIGHEST-precision filters and clamp variances)."""
    from text_segmentation_image_inpainting_tpu.train.metrics import ssim

    flat = jnp.full((1, 64, 64, 3), 0.97, jnp.float32)
    noise = jnp.asarray(rng.normal(0, 1e-3, (1, 64, 64, 3)).astype(np.float32))
    for a, b in [(flat, flat), (flat, flat + noise)]:
        v = float(ssim(a, b))
        assert v <= 1.0 + 1e-5, v
        assert v >= 0.95, v
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    assert abs(float(ssim(x, x)) - 1.0) < 1e-5


def test_checkpoint_roundtrip_with_spectral_state(tmp_path):
    """CheckpointManager round-trip of the full TrainState, including the
    experiments track's spectral (u/v) collection added round 3."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from text_segmentation_image_inpainting_tpu.train.checkpoint import CheckpointManager
    from text_segmentation_image_inpainting_tpu.train.state import TrainState

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    state = TrainState.create(
        apply_fn=lambda *a: None,
        params=params,
        tx=optax.sgd(1e-2),
        batch_stats={"bn": {"mean": jnp.ones((3,))}},
        spectral={"attn": {"u": jnp.asarray([0.6, 0.8]), "v": jnp.zeros((3,))}},
    )
    state = state.replace(step=7)

    ckpt = CheckpointManager(str(tmp_path / "ck"), save_interval_steps=1)
    assert ckpt.save(7, state)
    ckpt.wait()

    template = jax.tree.map(jnp.zeros_like, state)
    restored, step = ckpt.restore_latest(template)
    ckpt.close()
    assert step == 7 and int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(
        np.asarray(restored.spectral["attn"]["u"]), np.asarray([0.6, 0.8], np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.batch_stats["bn"]["mean"]), np.ones((3,), np.float32)
    )


def test_checkpoint_restore_none_spectral(tmp_path):
    """States without spectral state (every non-experiment model) still
    round-trip — the None field must not disturb orbax's tree layout."""
    import jax.numpy as jnp
    import numpy as np
    import optax

    from text_segmentation_image_inpainting_tpu.train.checkpoint import CheckpointManager
    from text_segmentation_image_inpainting_tpu.train.state import TrainState

    state = TrainState.create(
        apply_fn=lambda *a: None, params={"w": jnp.ones((4,))}, tx=optax.sgd(1e-2)
    )
    ckpt = CheckpointManager(str(tmp_path / "ck"), save_interval_steps=1)
    assert ckpt.save(0, state)
    ckpt.wait()
    restored, step = ckpt.restore_latest(state)
    ckpt.close()
    assert step == 0
    assert restored.spectral is None and restored.batch_stats is None
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.ones((4,), np.float32))
