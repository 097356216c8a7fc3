#!/usr/bin/env python3
"""Dump the optimized HLO of the train step and aggregate copy/transpose ops.

The step profile (scripts/profile_step.py) charges ~9ms/step to layout
copies between XLA's conv layouts and the Pallas kernels' row-major
operands. This script answers *which* copies exist: it compiles the same
step used by scripts/bench_train.py and prints every copy/transpose/bitcast
fusion with operand shapes + layouts, aggregated by shape, so the copy
traffic can be attributed to specific graph edges.

Usage: python scripts/inspect_hlo.py [--model map_convnext_tiny] [-b 128]
       [--eval] [--grep copy]
"""

import argparse
import collections
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="map_convnext_tiny")
parser.add_argument("-b", "--batch-size", type=int, default=128)
parser.add_argument("--eval", action="store_true")
parser.add_argument("--grep", default=r"copy|transpose")
parser.add_argument("--out", default="", help="also write full HLO text here")


def main():
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp

    from imagenet_models_tpu.core.setup import setup_jax

    setup_jax()
    import imagenet_models_tpu.models  # noqa: F401
    from imagenet_models_tpu import create_model

    model = create_model(args.model, dtype=jnp.bfloat16)
    b, s = args.batch_size, 224
    x = jnp.asarray(np.random.default_rng(0).standard_normal((b, s, s, 3)),
                    jnp.float32)
    v = jax.jit(lambda k, x1: model.init(k, x1, training=False))(
        jax.random.PRNGKey(0), x[:1])

    def flatten_heads(out):
        tot = 0.0
        for o in out if isinstance(out, (tuple, list)) else (out,):
            for t in (o if isinstance(o, (tuple, list)) else (o,)):
                tot = tot + jnp.sum(t.astype(jnp.float32) ** 2)
        return tot

    if args.eval:
        fn = jax.jit(lambda v, x: flatten_heads(model.apply(v, x, training=False)))
        lowered = fn.lower(v, x)
    else:
        def loss(p, x):
            out, _ = model.apply({**v, "params": p}, x, training=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(0)})
            return flatten_heads(out)
        g = jax.jit(jax.grad(loss))
        lowered = g.lower(v["params"], x)

    compiled = lowered.compile()
    txt = compiled.as_text()
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(txt)
        print(f"wrote {len(txt)} bytes to {args.out}")

    # aggregate matching ops by (op kind, shape-with-layout)
    pat = re.compile(args.grep)
    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2, "u8": 1,
                "s8": 1, "pred": 1, "u16": 2, "s16": 2}
    agg = collections.Counter()
    bytes_agg = collections.Counter()
    n = 0
    for line in txt.splitlines():
        m = re.match(r"\s*%?[\w\.\-]+ = (\w+)\[([\d,]*)\](\{[^}]*\})? (\w+)", line)
        if not m:
            continue
        dt, shape, layout, op = m.groups()
        if not pat.search(op) and not pat.search(line.split("=", 1)[1][:60]):
            continue
        dims = [int(d) for d in shape.split(",") if d] if shape else []
        nbytes = int(np.prod(dims)) * dt_bytes.get(dt, 4) if dims else 0
        key = f"{op:12s} {dt}[{shape}]{layout or ''}"
        agg[key] += 1
        bytes_agg[key] += nbytes
        n += 1
    print(f"== {args.model} b={b} {'eval' if args.eval else 'train'}: "
          f"{n} ops matching /{args.grep}/ ==")
    total = 0
    for key, cnt in sorted(agg.items(), key=lambda kv: -bytes_agg[kv[0]])[:40]:
        mb = bytes_agg[key] / 1e6
        total += bytes_agg[key]
        print(f"  {cnt:4d} x {key}  ({mb:.1f} MB total)")
    print(f"total matched bytes: {total / 1e6:.1f} MB "
          f"(~{total / 820e9 * 1e3 * 2:.2f} ms at 820GB/s r+w)")


if __name__ == "__main__":
    main()
