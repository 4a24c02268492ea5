"""Profile the fused pipeline on the real TPU and print top HLO costs.

Runs the production TextRemovalPipeline (512^2, bf16, batch 8) under
``jax.profiler.trace`` and aggregates per-HLO device durations from the
gzipped chrome trace (the axon tunnel writes the device timeline to
``<dir>/plugins/profile/*/*.trace.json.gz``).

Usage:  python bench/profile_pipeline.py [--batch 8] [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_trace(log_dir: str, top: int = 30):
    paths = glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {log_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device pids: anything whose process_name isn't python/host
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e["args"].get("name", "")
            if "TPU" in name or "/device" in name.lower() or name.startswith("XLA"):
                device_pids.add(e["pid"])
    by_op = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_op[name] += dur
        calls[name] += 1
        total += dur
    rows = by_op.most_common(top)
    return rows, calls, total


def profile_train(args):
    """Trace the full train step (fwd + losses + bwd + optax update)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from text_segmentation_image_inpainting_tpu.models import (
        InpaintUNet,
        TextSegmenter,
        VGG16Features,
    )
    from text_segmentation_image_inpainting_tpu.train import (
        InpaintTrainConfig,
        SegTrainConfig,
        create_train_state,
        make_inpaint_train_step,
        make_seg_train_step,
    )

    rng = np.random.default_rng(0)
    batch, size = args.batch, args.size
    if args.what == "train-seg":
        cfg = SegTrainConfig(image_size=(size, size))
        model = TextSegmenter(dtype=jnp.bfloat16)
        b = {
            "image": jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32)),
            "mask": jnp.asarray((rng.random((batch, size, size, 1)) > 0.9).astype(np.float32)),
        }
        variables = jax.jit(model.init)(jax.random.key(0), b["image"][:1])
        state = create_train_state(variables, model.apply, cfg.optimizer)
        step = jax.jit(make_seg_train_step(model, cfg))
    else:
        cfg = InpaintTrainConfig(image_size=(size, size))
        model = InpaintUNet(dtype=jnp.bfloat16)
        vgg = VGG16Features()
        b = {
            "image": jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32)),
            "mask": jnp.asarray((rng.random((batch, size, size, 1)) > 0.08).astype(np.float32)),
        }
        variables = jax.jit(model.init)(
            jax.random.key(1), b["image"][:1] * b["mask"][:1], b["mask"][:1]
        )
        vgg_vars = jax.jit(vgg.init)(jax.random.key(2), b["image"][:1])
        state = create_train_state(variables, model.apply, cfg.optimizer)
        step = jax.jit(make_inpaint_train_step(model, cfg, vgg_vars))

    import tempfile

    state, m = step(state, b)
    float(m["total"])  # compile + settle
    hlo_src = {}
    if os.environ.get("PROFILE_DUMP_HLO"):
        import re

        txt = step.lower(state, b).compile().as_text()
        for line in txt.splitlines():
            mm = re.search(r"%?([\w.\-]+) = .*op_name=\"([^\"]+)\"", line)
            if mm:
                hlo_src[mm.group(1)] = mm.group(2)
    log_dir = tempfile.mkdtemp(prefix="prof_")
    jax.profiler.start_trace(log_dir)
    for _ in range(args.iters):
        state, m = step(state, b)
    float(m["total"])
    jax.profiler.stop_trace()
    rows, calls, total = aggregate_trace(log_dir, args.top)
    print(f"# device total {total:.2f} ms over {args.iters} iters "
          f"=> {total / args.iters:.2f} ms/iter ({args.what}, batch {batch})")
    print(f"{'ms/iter':>9}  {'calls':>5}  op")
    for name, ms in rows:
        print(f"{ms / args.iters:9.3f}  {calls[name] // args.iters:5d}  {name[:110]}")

    if hlo_src:
        import collections as _c

        by_src = _c.Counter()
        all_rows, _, _ = aggregate_trace(log_dir, 100000)
        for name, ms in all_rows:
            if name.startswith("jit_") or name in ("0", "1", "2"):
                continue
            src = hlo_src.get(name, "(unattributed)")
            depth = int(os.environ.get("PROFILE_SCOPE_DEPTH", "3"))
            by_src["/".join(src.split("/")[:depth])] += ms
        print("\n# by source scope (op_name)")
        for src, ms in by_src.most_common(args.top):
            print(f"{ms / args.iters:9.3f}  {src[:130]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--what",
        choices=["pipeline", "seg", "inpaint", "train-seg", "train-inpaint"],
        default="pipeline",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    from text_segmentation_image_inpainting_tpu.pipeline import TextRemovalPipeline
    from text_segmentation_image_inpainting_tpu.utils.profiling import sync

    if args.what.startswith("train-"):
        profile_train(args)
        return

    pipe = TextRemovalPipeline()
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(args.size, args.size))
    pages = jnp.asarray(
        np.random.default_rng(0).random((args.batch, args.size, args.size, 3), dtype=np.float32)
    )

    if args.what == "pipeline":
        fn = jax.jit(pipe.run)
        call = lambda: fn(seg_vars, unet_vars, pages)  # noqa: E731
    elif args.what == "seg":
        fn = jax.jit(pipe.segment)
        call = lambda: fn(seg_vars, pages)  # noqa: E731
    else:
        mask = (pages[..., :1] > 0.8).astype(jnp.float32)
        fn = jax.jit(pipe.inpaint)
        call = lambda: fn(unet_vars, pages, mask)  # noqa: E731

    sync(call())  # compile
    log_dir = tempfile.mkdtemp(prefix="prof_")
    jax.profiler.start_trace(log_dir)
    for _ in range(args.iters):
        out = call()
    sync(out)
    jax.profiler.stop_trace()

    rows, calls, total = aggregate_trace(log_dir, args.top)
    print(f"# device total {total:.2f} ms over {args.iters} iters "
          f"=> {total / args.iters:.2f} ms/iter ({args.what}, batch {args.batch})")
    print(f"{'ms/iter':>9}  {'calls':>5}  op")
    for name, ms in rows:
        print(f"{ms / args.iters:9.3f}  {calls[name] // args.iters:5d}  {name[:110]}")

    # second view: attribute HLO time to the *source* op (jax op_name
    # metadata) by cross-referencing the optimized HLO text
    hlo_path = os.environ.get("PROFILE_HLO_DUMP")
    if hlo_path and os.path.exists(hlo_path):
        import re

        src_of = {}
        for line in open(hlo_path):
            m = re.search(r"%(\S+?) = .*op_name=\"([^\"]+)\"", line)
            if m:
                src_of[m.group(1)] = m.group(2)
        by_src = collections.Counter()
        all_rows, _, _ = aggregate_trace(log_dir, 100000)
        for name, ms in all_rows:
            if name.startswith("jit_"):
                continue
            src = src_of.get(name, "(unattributed:" + name.split(".")[0] + ")")
            by_src[src] += ms
        print("\n# by source op_name")
        for src, ms in by_src.most_common(args.top):
            print(f"{ms / args.iters:9.3f}  {src[:130]}")


if __name__ == "__main__":
    main()
