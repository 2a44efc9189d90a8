#!/usr/bin/env python
"""Measure the reference PyTorch training step on THIS host (CPU).

The reference publishes no benchmark numbers (BASELINE.md), so the only
measurable baseline is the reference's own code run on available hardware.
This script imports the reference's architecture classes from
/root/reference (runtime import for measurement — no code is copied) and
times the exact per-item paired adversarial update of
reference models/model.py:598-658 (G fwd, D step on detached+real, G step
with LSGAN + 100*L1, Adam 2e-4) at 512^2 batch 1 on CPU.

Prints one JSON line with steps/sec; BENCH_NOTES.md records the result and
bench.py uses it as the measured anchor for vs_baseline.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pairedattention",
                   choices=["pairedattention", "pix2pix"])
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--channels", type=int, default=9)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    args = p.parse_args()

    sys.path.insert(0, "/root/reference")
    import torch
    from models import model_architectures as ref_arch

    torch.manual_seed(47)
    C = args.channels
    if args.model == "pairedattention":
        gen = ref_arch.PairedAttentionGenerator(C)
        disc = ref_arch.PairedAttentionDiscriminator(C)
    else:
        gen = ref_arch.Pix2PixGenerator(C)
        disc = ref_arch.Pix2PixDiscriminator(C)

    mse = torch.nn.MSELoss()
    l1 = torch.nn.L1Loss()
    opt_g = torch.optim.Adam(gen.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(disc.parameters(), lr=2e-4, betas=(0.5, 0.999))

    x = torch.randn(1, C, args.size, args.size)
    y = torch.randn(1, 3, args.size, args.size)

    def step():
        synth = gen(x)
        concat_real = torch.cat((x, y), 1)
        concat_synth = torch.cat((x, synth), 1)
        for prm in disc.parameters():
            prm.requires_grad = True
        opt_d.zero_grad()
        pred_s = disc(concat_synth.detach())
        loss_ds = mse(pred_s, torch.zeros_like(pred_s))
        pred_r = disc(concat_real)
        loss_dr = mse(pred_r, torch.ones_like(pred_r))
        ((loss_ds + loss_dr) * 0.5).backward()
        opt_d.step()
        for prm in disc.parameters():
            prm.requires_grad = False
        opt_g.zero_grad()
        pred_s2 = disc(concat_synth)
        loss_g = mse(pred_s2, torch.ones_like(pred_s2)) + l1(synth, y) * 100
        loss_g.backward()
        opt_g.step()
        return float(loss_g.detach())

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = (time.perf_counter() - t0) / args.steps
    print(
        json.dumps(
            {
                "what": f"reference torch {args.model} paired step, {args.size}^2 batch 1, CPU ({torch.get_num_threads()} threads)",
                "sec_per_step": round(dt, 3),
                "steps_per_sec": round(1.0 / dt, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
