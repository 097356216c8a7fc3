#!/usr/bin/env python3
"""Compare the fast-vs-exact GELU convergence A/B arms
(artifacts/convergence/gelu_ab_{fast,exact}/summary.csv) and print a
per-epoch table + one JSON verdict line for PARITY.md.

Both arms share seed, data, flags (scripts/convergence_gelu_ab.sh); the
deviation under test is the training-mode single-segment minimax GELU
(nn/layers.py gelu_fast / ops/convnext_block.py "fast") vs the reference's
exact-erf numerics."""

import csv
import json
import os
import sys


def read(arm):
    p = os.path.join("artifacts/convergence", f"gelu_ab_{arm}", "summary.csv")
    rows = {}
    with open(p) as f:
        for r in csv.DictReader(f):
            rows[int(r["epoch"])] = {k: float(v) for k, v in r.items()}
    return rows


def main():
    fast, exact = read("fast"), read("exact")
    epochs = sorted(set(fast) & set(exact))
    if not epochs:
        sys.exit("no common epochs")
    print(f"{'ep':>3} {'loss_f':>8} {'loss_e':>8} {'top1_f':>7} {'top1_e':>7}"
          f" {'raw1_f':>7} {'raw1_e':>7} {'d_loss':>8} {'d_raw1':>7}")
    d_loss, d_raw = [], []
    for e in epochs:
        f, x = fast[e], exact[e]
        dl = f["train_loss"] - x["train_loss"]
        dr = f["eval_raw_top1"] - x["eval_raw_top1"]
        d_loss.append(dl)
        d_raw.append(dr)
        print(f"{e:>3} {f['train_loss']:>8.4f} {x['train_loss']:>8.4f}"
              f" {f['eval_top1']:>7.2f} {x['eval_top1']:>7.2f}"
              f" {f['eval_raw_top1']:>7.2f} {x['eval_raw_top1']:>7.2f}"
              f" {dl:>+8.4f} {dr:>+7.2f}")
    last = epochs[-1]
    # epoch-to-epoch raw-top1 movement of the exact arm = the scale of
    # ordinary trajectory fluctuation the deltas should sit inside
    moves = [abs(exact[b]["eval_raw_top1"] - exact[a]["eval_raw_top1"])
             for a, b in zip(epochs, epochs[1:])]
    print(json.dumps({
        "epochs": len(epochs),
        "final_raw_top1_fast": fast[last]["eval_raw_top1"],
        "final_raw_top1_exact": exact[last]["eval_raw_top1"],
        "final_delta_raw_top1": fast[last]["eval_raw_top1"] - exact[last]["eval_raw_top1"],
        "max_abs_delta_raw_top1": max(abs(d) for d in d_raw),
        "max_abs_delta_train_loss": max(abs(d) for d in d_loss),
        "exact_arm_epoch_move_median": sorted(moves)[len(moves) // 2] if moves else None,
    }))


if __name__ == "__main__":
    main()
