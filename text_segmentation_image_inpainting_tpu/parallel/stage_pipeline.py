"""Two-stage (segment | inpaint) pipeline parallelism over a device pair.

SURVEY.md §2.2 PP disposition: the reference has no pipelining; the
segment→inpaint handoff is a natural 2-stage pipeline. v1 shipped the
same-device fused chain; this module is the cross-DEVICE schedule: a
``'stage'`` mesh axis of size 2 runs the segmenter on device 0 and the
inpainting U-Net on device 1, with the (pages, valid-mask) payload
hopping one ICI neighbor per microbatch step via ``lax.ppermute``.

Schedule (GPipe-style, inference): at scan step t, stage 0 segments
microbatch t while stage 1 inpaints microbatch t-1 — both stages busy
every step after the 1-step fill, so with balanced stages the pipeline
approaches 2x one device's throughput. SPMD needs one program for both
devices: each step computes ``lax.cond(stage_index == 0, seg, inpaint)``
(XLA compiles both branches, each device executes its own; collectives
stay OUTSIDE the cond) and exchanges a uniform (N, H, W, 4) payload
([pages | valid2d] from stage 0, [clean | junk] from stage 1).

``pipeline2_run`` bit-matches the fused single-device ``pipe.run`` on
the 8-virtual-CPU mesh (tests/test_spatial_parallel.py) — same math,
different schedule. Single-chip hardware cannot measure the overlap;
the test proves the schedule and the ICI handoff are correct.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

STAGE_AXIS = "stage"


def make_stage_mesh(devices=None) -> Mesh:
    """A 2-device mesh with the ``'stage'`` axis (seg | inpaint)."""
    devices = jax.devices() if devices is None else list(devices)
    assert len(devices) >= 2, "stage pipelining needs 2 devices"
    return Mesh(devices[:2], (STAGE_AXIS,))


def pipeline2_run(
    mesh: Mesh,
    pipe,
    seg_variables,
    unet_variables,
    pages_mb: jax.Array,
) -> jax.Array:
    """Run T microbatches through the 2-stage device pipeline.

    pages_mb: (T, N, H, W, 3) in [0, 1], H/W divisible by the U-Net
    multiple. Returns (T, N, H, W, 3) composited clean pages
    (compute_dtype), identical to ``pipe.run`` per microbatch.
    """
    t_mb, n, h, w, _ = pages_mb.shape
    dt = pipe.compute_dtype

    def local(seg_v, unet_v, pages_mb):
        sidx = lax.axis_index(STAGE_AXIS)

        def seg_stage(t):
            # clamp the index for the drain step (t == T): the result is
            # computed but never consumed
            p = lax.dynamic_index_in_dim(
                pages_mb, jnp.minimum(t, t_mb - 1), keepdims=False
            ).astype(dt)
            valid2d = pipe._segment2d(seg_v, p)
            out = jnp.concatenate([p, valid2d[..., None]], axis=-1)
            # replicated inputs -> mark varying to match the other branch
            return lax.pcast(out, (STAGE_AXIS,), to="varying")

        def inpaint_stage(payload):
            p, valid2d = payload[..., :3], payload[..., 3]
            clean = pipe._inpaint2d(unet_v, p, valid2d)
            return jnp.concatenate([clean, payload[..., 3:]], axis=-1)

        def body(carry, t):
            # both branches produce the uniform (N, H, W, 4) payload;
            # each device runs only its own stage's branch
            out = lax.cond(
                sidx == 0, lambda c: seg_stage(t), inpaint_stage, carry
            )
            # stage 0 -> stage 1 handoff; stage 1's slot wraps to stage 0
            # as a dummy (never read: stage 0 ignores its carry)
            nxt = lax.ppermute(out, STAGE_AXIS, [(0, 1), (1, 0)])
            return nxt, out

        # mark the carry as device-varying over the stage axis (each
        # device's carry differs; scan requires matching vma types)
        carry0 = lax.pcast(jnp.zeros((n, h, w, 4), dt), (STAGE_AXIS,), to="varying")
        _, outs = lax.scan(body, carry0, jnp.arange(t_mb + 1))
        return outs  # (T+1, N, H, W, 4); stage 1's rows 1..T are real

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        # stack the two stages' per-step outputs on a leading axis
        out_specs=P(STAGE_AXIS),
    )
    outs = fn(seg_variables, unet_variables, jnp.asarray(pages_mb))
    # global (2*(T+1), N, H, W, 4): rows 0..T are stage 0 (pages|mask),
    # rows T+1 .. 2T+1 are stage 1; its steps 1..T carry the clean pages
    return outs[t_mb + 2 :, ..., :3]


def pipeline2_throughput_model(t_seg: float, t_inpaint: float, t_mb: int) -> Tuple[float, float]:
    """(fused single device, 2-stage pipelined) seconds for T microbatches —
    the analytical model the schedule targets: fill + max-stage-bound."""
    fused = t_mb * (t_seg + t_inpaint)
    piped = (t_seg + t_inpaint) + (t_mb - 1) * max(t_seg, t_inpaint)
    return fused, piped


# -- TRAINING-side 2-stage parallelism --------------------------------------
#
# The reference trains the two stages INDEPENDENTLY (separate datasets,
# separate losses, separate drivers — SURVEY.md C11 [R]): the inpainting
# U-Net trains on (gt, random-hole-mask) pairs, never on segmenter
# output, so NO gradient ever crosses the stage boundary. GPipe-style
# training pipelining (activations forward / cotangents backward over
# ICI) is therefore structurally unnecessary here — the training-side
# analogue of pipeline parallelism is plain CONCURRENCY: split the mesh
# into two disjoint DP groups and let JAX's async dispatch run both
# stages' train steps simultaneously.
#
# When is that worth it over DP of each stage over ALL devices, one
# stage after the other? Per-chip measured step times (512², batch 8,
# bench/results.json config 4): seg 38.7 ms, inpaint 108.9 ms. On 2n
# devices training both models:
#   sequential, each DP over 2n:  (38.7 + 108.9)/2n * ... = 73.8/n ms
#   concurrent, n devices/stage:  max(38.7, 108.9)/n     = 108.9/n ms
# All-DP wins 1.48x because the stages are imbalanced (DP parallelizes
# BOTH steps; a stage split idles the seg group 64% of the time) and DP
# gradient all-reduces of these ≤35 MB models are cheap on ICI. The
# stage split only wins when the two jobs contend for host input
# bandwidth or HBM (not the case at these sizes). Hence: the framework
# ships concurrent 2-group training as a composition helper (below,
# tested for exactness) and documents all-devices DP as the production
# default for training.


def make_group_meshes(devices=None, *, seg_fraction: float = 0.5):
    """Partition devices into two disjoint DP meshes (seg, inpaint)."""
    from text_segmentation_image_inpainting_tpu.parallel.mesh import make_mesh

    devices = jax.devices() if devices is None else list(devices)
    assert len(devices) >= 2, "2-group training needs 2+ devices"
    k = max(1, min(len(devices) - 1, int(round(len(devices) * seg_fraction))))
    return make_mesh(devices=devices[:k]), make_mesh(devices=devices[k:])


def concurrent_train2(seg_step, inpaint_step):
    """Compose the two stages' (already jitted, group-mesh-bound) train
    steps into one call that dispatches both without synchronizing in
    between — JAX async dispatch overlaps them on their disjoint device
    groups. Returns ``step(seg_state, seg_batch, inp_state, inp_batch)
    -> (seg_state, seg_metrics, inp_state, inp_metrics)``.

    The math is identical to running the steps separately (they share
    no state and no devices); tests/test_stage_pipeline.py asserts
    bit-equality against the sequential single-group run.
    """

    def step(seg_state, seg_batch, inp_state, inp_batch):
        seg_state, seg_metrics = seg_step(seg_state, seg_batch)
        inp_state, inp_metrics = inpaint_step(inp_state, inp_batch)
        return seg_state, seg_metrics, inp_state, inp_metrics

    return step
