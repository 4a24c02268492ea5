"""Config 5 (BASELINE.md:25): data-parallel bf16 streaming throughput —
batches pulled through ``make_dataset`` (host synthesis/decode) +
``DevicePrefetcher`` (H2D overlap) into the fused pipeline.

Unlike the closed-loop configs this measures the whole producer->device
path, i.e. host starvation shows up here. On the single axon chip the
mesh is 1-wide DP; the same code drives an N-chip mesh (sharding comes
from ``shard_batch``'s NamedSharding on the prefetcher). Completion is
forced by one scalar read of the LAST batch's output: device programs
retire in dispatch order, so last-done implies all-done.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from bench.common import TARGET_PAGES_PER_SEC_PER_CHIP, emit, emit_failure

METRIC = "dp_streaming_512px_pages_per_sec"
SERVE_METRIC = "serve_streaming_512px_pages_per_sec"


def measure_link(size_mb: float = 6.0) -> dict:
    """Measured H2D / D2H rates of THIS session's device link, plus the
    fixed round-trip latency. On a tunnel-attached chip these rates ARE
    the serving wall; the serve benches emit them alongside the
    throughput so `link_ceiling_pages_per_sec` is machine-checkable.

    block_until_ready does not block on the axon tunnel (docs/STATUS.md),
    so H2D is forced by a scalar readback and D2H uses FRESH device
    arrays (jax caches a fetched array's numpy value).
    """
    dev = jax.devices()[0]
    nbytes = int(size_mb * 1e6)
    sink = jax.jit(lambda x: jnp.sum(x, dtype=jnp.uint32) & jnp.uint32(0xFF))
    host = np.zeros((nbytes,), np.uint8)
    int(sink(jax.device_put(host, dev)))  # warm compile + path

    tiny = np.zeros((128,), np.uint8)
    ts = sorted(
        _timed(lambda: int(sink(jax.device_put(tiny, dev)))) for _ in range(5)
    )
    rtt_s = ts[len(ts) // 2]

    ts = sorted(
        _timed(lambda: int(sink(jax.device_put(host, dev)))) for _ in range(3)
    )
    h2d = nbytes / 1e6 / max(ts[len(ts) // 2] - rtt_s, 1e-9)

    mk = jax.jit(lambda i: jnp.full((nbytes,), i, jnp.uint8))
    arrs = [mk(jnp.uint8(i)) for i in range(4)]
    np.asarray(arrs[0])  # warm
    ts = sorted(_timed(lambda a=a: np.asarray(a)) for a in arrs[1:])
    d2h = nbytes / 1e6 / max(ts[len(ts) // 2] - rtt_s, 1e-9)
    return {
        "h2d_mb_s": round(h2d, 1),
        "d2h_mb_s": round(d2h, 1),
        "link_rtt_ms": round(rtt_s * 1e3, 1),
    }


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main_serve(batch: int = 8, size: int = 512, n_batches: int = 30, workers: int = 2,
               depth: int = 3, pool: int = 0, chunk: int = 1, sparse: int = 0,
               trials: int = 1):
    """Sustained SERVING throughput via ``PageStreamServer``: host
    batches -> H2D -> seg -> inpaint -> D2H of EVERY uint8 result,
    pipelined ``depth`` batches deep. The honest end-to-end service
    number (the dispatch-style ``main`` below syncs only once).

    ``pool=N`` pre-synthesizes N host batches and cycles them, isolating
    the H2D/compute/D2H pipeline from this box's 1-core page-synthesis
    rate (live synthesis manages ~35 pages/s and starves the chip; any
    production host decodes JPEGs across multiple cores instead)."""
    from text_segmentation_image_inpainting_tpu.data.pipeline import make_page_stream_u8
    from text_segmentation_image_inpainting_tpu.pipeline import (
        PageStreamServer,
        TextRemovalPipeline,
    )

    pipe = TextRemovalPipeline()
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(size, size))
    # trained weights when available: random-init segmentation marks
    # arbitrary mask regions (can exceed any sparse tile budget on every
    # page -> permanent dense fallback); the committed snapshots give the
    # realistic ~5-15% text coverage the sparse wire format is FOR
    from pathlib import Path as _P

    trained = _P(__file__).resolve().parent.parent / "trained"
    if (trained / "seg_synth.msgpack").exists() and size == 512:
        from text_segmentation_image_inpainting_tpu.models.base import load_model

        seg_vars = load_model(str(trained / "seg_synth.msgpack"), seg_vars)
        if (trained / "inpaint_synth.msgpack").exists():
            unet_vars = load_model(str(trained / "inpaint_synth.msgpack"), unet_vars)
    # sparse=K: changed-tile result return — the D2H-bytes lever on this
    # tunnel-attached rig (dense uint8 page ≈ 786 KB; K=64 32² tiles ≈ 260 KB)
    server = PageStreamServer(pipe, seg_vars, unet_vars, depth=depth, chunk=chunk,
                              sparse_tiles=sparse)

    # uint8 pages, as a production image source would hold them — also 4x
    # fewer bytes over the tunnel's H2D path; native C++ synthesis when built
    host_it = make_page_stream_u8(batch_size=batch, size=(size, size))
    if pool:
        batches = [next(host_it)["image"] for _ in range(pool)]

        def take(n):
            for i in range(n):
                yield batches[i % pool]
    else:

        def take(n):
            for _ in range(n):
                yield next(host_it)["image"]

    # warmup: compile + fill the pipeline
    for _ in server.serve(take(2 * chunk)):
        pass

    rates = []
    wire0 = server.wire_bytes
    for _ in range(max(1, trials)):
        t0 = time.perf_counter()
        got = sum(1 for _ in server.serve(take(n_batches)))
        dt = time.perf_counter() - t0
        assert got == n_batches
        rates.append(batch * n_batches / dt)
    rates.sort()
    pages_per_sec = rates[len(rates) // 2]
    extra = {}
    if len(rates) > 1:
        extra["band_pages_per_sec"] = [round(rates[0], 1), round(rates[-1], 1)]
        extra["trials"] = len(rates)

    # link-ceiling accounting (VERDICT r3 item 3): wire bytes per page in
    # each direction / measured link rate = the hard throughput ceiling
    # of this rig, independent of compute. H2D ships the uint8 input
    # page; D2H ships the dense uint8 page+mask, or the measured sparse
    # flat buffers (adaptive tile budget — true bytes accounted by the
    # server). Directions overlap, so the ceiling is the binding one.
    link = measure_link()
    h2d_bytes = size * size * 3
    if sparse:
        total_pages = max(1, batch * n_batches * max(1, trials))
        d2h_bytes = (server.wire_bytes - wire0) / total_pages
    else:
        d2h_bytes = size * size * 4  # clean RGB + mask, uint8
    ceil_h2d = link["h2d_mb_s"] * 1e6 / h2d_bytes
    ceil_d2h = link["d2h_mb_s"] * 1e6 / max(d2h_bytes, 1)
    extra.update(
        link,
        h2d_bytes_per_page=int(h2d_bytes),
        d2h_bytes_per_page=int(d2h_bytes),
        link_ceiling_pages_per_sec=round(min(ceil_h2d, ceil_d2h), 1),
        ceiling_attained=round(pages_per_sec / min(ceil_h2d, ceil_d2h), 3),
    )
    emit(SERVE_METRIC, pages_per_sec, "pages/s",
         pages_per_sec / TARGET_PAGES_PER_SEC_PER_CHIP,
         bar=min(ceil_h2d, ceil_d2h),
         bar_source="measured tunnel link ceiling (min of H2D/D2H wire "
                    "bytes per page at measured MB/s)",
         batch=batch, n_batches=n_batches, depth=depth, pool=pool, chunk=chunk,
         sparse=sparse, **extra)


def main(batch: int = 8, size: int = 512, n_batches: int = 30, workers: int = 2,
         pool: int = 4, chunk: int = 4, trials: int = 5):
    """Two streaming measurements, one JSON line:

    - value: uint8 pages from a ``pool``-batch pre-synthesized pool,
      streamed through ``DevicePrefetcher`` (H2D thread) into the fused
      pipeline ``chunk`` batches per dispatch (lax.map — amortizes the
      ~16 ms tunnel dispatch RTT), results device-resident, one sync at
      the end — the DP data-pipeline throughput (H2D/compute overlap).
    - ``live_synthesis_pages_per_sec``: per-batch dispatch with every
      batch freshly synthesized by ``make_dataset`` — on this 1-core
      host the PIL page synthesis itself is the bound (a production
      host decodes JPEGs across many cores).
    """
    from text_segmentation_image_inpainting_tpu.data.pipeline import (
        DevicePrefetcher,
        make_page_stream_u8,
    )
    from text_segmentation_image_inpainting_tpu.parallel import batch_sharding, make_mesh
    from text_segmentation_image_inpainting_tpu.pipeline import TextRemovalPipeline

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sharding = batch_sharding(mesh)

    pipe = TextRemovalPipeline()
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(size, size))

    def run_u8(seg_v, unet_v, pages_u8):
        pages = pages_u8.astype(jnp.bfloat16) * (1.0 / 255.0)
        return pipe.run(seg_v, unet_v, pages)

    run = jax.jit(run_u8, donate_argnums=(2,))
    run_chunk = jax.jit(
        lambda sv, uv, stack: jax.lax.map(lambda p: run_u8(sv, uv, p), stack),
        donate_argnums=(2,),
    )

    # u8 serving-format pages straight from the native C++ engine (the
    # PIL fallback quantizes inside make_page_stream_u8)
    host_it = make_page_stream_u8(batch_size=batch, size=(size, size))

    def measure(source_iter, n, runner, shard, pages_per_dispatch):
        """Returns (pages/s, detail) where detail splits the trial's wall
        time into host-wait (blocked on the prefetcher = host synthesis /
        H2D) vs sync-wait (the final D2H scalar read = device + tunnel) —
        the two noise sources of this link, separable per trial."""
        pf = DevicePrefetcher(source_iter, sharding=shard, depth=3)
        try:
            b = next(pf)  # warmup: compile + fill the prefetch queue
            clean, mask = runner(seg_vars, unet_vars, b["image"])
            float(jnp.sum(mask.astype(jnp.float32)))
            t0 = time.perf_counter()
            host_wait = 0.0
            outs = None
            for _ in range(n):
                h0 = time.perf_counter()
                b = next(pf)
                host_wait += time.perf_counter() - h0
                outs = runner(seg_vars, unet_vars, b["image"])
            s0 = time.perf_counter()
            float(jnp.sum(outs[1].astype(jnp.float32)))  # sync on the last batch
            t1 = time.perf_counter()
            detail = {
                "t_start": round(t0, 3),
                "wall_s": round(t1 - t0, 3),
                "host_wait_s": round(host_wait, 3),
                "sync_wait_s": round(t1 - s0, 3),
            }
            return pages_per_dispatch * n / (t1 - t0), detail
        finally:
            pf.close()

    # pooled: host synthesis out of the loop; chunk batches per dispatch
    # (batch dim stays the sharded DP axis: chunk is a leading lax.map axis)
    pool_imgs = [next(host_it)["image"] for _ in range(pool)]
    chunk_shard = None
    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        chunk_shard = NamedSharding(mesh, P(None, "data"))

    def pooled():
        i = 0
        while True:
            yield {"image": np.stack([pool_imgs[(i + j) % pool] for j in range(chunk)])}
            i += chunk

    # variance protocol (VERDICT r3 item 5): the two noise sources —
    # tunnel stalls (device sync) vs host synthesis (prefetch wait) —
    # are separated PER TRIAL; the headline gates on the chip-bound
    # pool-cycled median, outlier trials carry their diagnosed cause.
    n_disp = max(1, n_batches // chunk)
    trial_recs = []
    for _ in range(max(1, trials)):
        rate, detail = measure(pooled(), n_disp, run_chunk, chunk_shard, batch * chunk)
        trial_recs.append({"pages_per_sec": round(rate, 1), **detail})
    rates = sorted(r["pages_per_sec"] for r in trial_recs)
    pooled_rate = rates[len(rates) // 2]
    for rec in trial_recs:
        if pooled_rate and abs(rec["pages_per_sec"] - pooled_rate) / pooled_rate > 0.2:
            rec["outlier_cause"] = (
                "tunnel/device stall (sync-dominated)"
                if rec["sync_wait_s"] >= rec["host_wait_s"]
                else "host starvation (prefetch-dominated)"
            )
    live_rate, live_detail = measure(
        ({"image": next(host_it)["image"]} for _ in iter(int, 1)),
        n_batches, run, sharding, batch,
    )

    # Attribute the residual gap vs the closed-loop number (VERDICT r4
    # weak #3): the H2D leg ships one uint8 page per page; at the
    # measured link rate that is a hard input-side ceiling for any
    # streaming schedule on this tunnel.
    link = measure_link()
    h2d_ceiling = link["h2d_mb_s"] * 1e6 / (size * size * 3)

    emit(METRIC, pooled_rate, "pages/s",
         pooled_rate / TARGET_PAGES_PER_SEC_PER_CHIP,
         batch=batch, n_batches=n_batches, devices=n_dev, pool=pool, chunk=chunk,
         trials=len(rates),
         band_pages_per_sec=[round(rates[0], 1), round(rates[-1], 1)],
         trial_detail=trial_recs,
         live_synthesis_pages_per_sec=round(live_rate, 2),
         live_synthesis_host_wait_s=live_detail["host_wait_s"],
         live_synthesis_wall_s=live_detail["wall_s"],
         h2d_link_ceiling_pages_per_sec=round(h2d_ceiling, 1),
         **link)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--n-batches", type=int, default=48)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--serve", action="store_true",
                   help="PageStreamServer sustained-serving mode (D2H every batch)")
    p.add_argument("--pool", type=int, default=4,
                   help="pre-synthesized host batch pool size (serve: 0 = live synthesis)")
    p.add_argument("--chunk", type=int, default=8,
                   help="stack k batches per dispatch (amortizes tunnel dispatch RTT)")
    p.add_argument("--trials", type=int, default=5,
                   help="pooled-throughput trials; median reported, min-max band attached")
    p.add_argument("--sparse", type=int, default=0,
                   help="serve mode: changed-tile sparse return budget (0 = dense)")
    args = p.parse_args()
    if args.serve:
        try:
            main_serve(args.batch, args.size, args.n_batches, args.workers,
                       pool=args.pool, chunk=args.chunk, sparse=args.sparse,
                       trials=args.trials)
        except Exception as e:
            emit_failure(SERVE_METRIC, "pages/s", e)
            raise
        raise SystemExit(0)
    try:
        main(args.batch, args.size, args.n_batches, args.workers, pool=args.pool,
             chunk=args.chunk, trials=args.trials)
    except Exception as e:
        emit_failure(METRIC, "pages/s", e)
        raise
