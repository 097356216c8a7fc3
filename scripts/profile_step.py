#!/usr/bin/env python3
"""Trace a train (or eval) step on the TPU and print a per-op-kind time
breakdown — the measurement loop behind the kernel work in ops/ (see
PARITY.md "Perf investigations").

Usage:
  python scripts/profile_step.py [--model map_convnext_tiny] [-b 128]
                                 [--eval] [--top 25]

Captures a jax.profiler device trace of 3 steps, then aggregates the
"XLA Ops" line of the xplane by fused-op kind. The tensorboard profile
plugin on this image cannot parse its own traces (proto version skew), so
the xplane proto is read directly.
"""

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="map_convnext_tiny")
parser.add_argument("-b", "--batch-size", type=int, default=128)
parser.add_argument("--eval", action="store_true", help="profile eval fwd only")
parser.add_argument("--full", action="store_true",
                    help="profile the real fused train step (fwd+bwd+LAMB"
                         "+EMA via make_train_step) instead of grad only")
parser.add_argument("--top", type=int, default=25)
parser.add_argument("--image-size", type=int, default=224)


def main():
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp

    from imagenet_models_tpu.core.setup import setup_jax

    setup_jax()
    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu import create_model

    model = create_model(args.model, dtype=jnp.bfloat16)
    s = args.image_size
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch_size, s, s, 3)), jnp.float32)
    v = jax.jit(lambda k, x1: model.init(k, x1, training=False))(
        jax.random.PRNGKey(0), x[:1])

    def flatten_heads(out):
        tot = 0.0
        for o in out if isinstance(out, (tuple, list)) else (out,):
            for t in (o if isinstance(o, (tuple, list)) else (o,)):
                tot = tot + jnp.sum(t.astype(jnp.float32) ** 2)
        return tot

    if args.full:
        # the production step: fwd+bwd+optimizer+EMA in one jit (shared
        # construction with bench_train/bench_zoo, utils/benchkit.py)
        from imagenet_models_tpu.utils.benchkit import build_bench_train_step

        step, tstate, xs, tgt = build_bench_train_step(
            args.model, args.batch_size, image_size=s)
        box = [tstate]

        def run():
            box[0], m = step(box[0], xs, tgt, jax.random.PRNGKey(0))
            return m["loss"]
    elif args.eval:
        fn = jax.jit(lambda v, x: flatten_heads(model.apply(v, x, training=False)))
        run = lambda: fn(v, x)
    else:
        def loss(p, x):
            out, _ = model.apply({**v, "params": p}, x, training=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(0)})
            return flatten_heads(out)
        g = jax.jit(jax.grad(loss))
        run = lambda: g(v["params"], x)

    r = run()
    _ = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])

    tmp = tempfile.mkdtemp(prefix="imtpu_trace_")
    jax.profiler.start_trace(tmp)
    for _ in range(3):
        r = run()
    _ = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    f = glob.glob(os.path.join(tmp, "plugins/profile/*/*.xplane.pb"))[0]
    xs = xplane_pb2.XSpace()
    with open(f, "rb") as fh:
        xs.ParseFromString(fh.read())
    plane = [p for p in xs.planes if p.name == "/device:TPU:0"][0]
    line = [l for l in plane.lines if l.name == "XLA Ops"][0]
    by_kind = collections.Counter()
    by_op = collections.Counter()
    total = 0
    for ev in line.events:
        name = plane.event_metadata[ev.metadata_id].name
        m = re.match(r"%?([a-zA-Z_\-]+)[\.\d]*\s*=?", name)
        by_kind[m.group(1) if m else name[:30]] += ev.duration_ps
        by_op[name] += ev.duration_ps
        total += ev.duration_ps

    mode = ("eval" if args.eval
            else "train full step" if args.full else "train fwd+bwd")
    print(f"== {args.model} b={args.batch_size} {mode}: "
          f"{total / 3e9:.2f} ms/step ==")
    print("-- by op kind --")
    for k, ps in by_kind.most_common(args.top):
        print(f"  {ps / 3e9:8.2f} ms  {k}")
    print("-- top individual ops --")
    for name, ps in by_op.most_common(args.top):
        print(f"  {ps / 3e9:8.2f} ms  {name[:140]}")


if __name__ == "__main__":
    main()
