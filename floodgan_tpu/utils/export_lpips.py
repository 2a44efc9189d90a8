"""Export LPIPS (alex) weights to the npz format eval/lpips.py loads.

Run on any machine where the ``lpips`` package (pip install lpips) and its
pretrained weights are available:

    python -m floodgan_tpu.utils.export_lpips lpips_alex.npz

then point FLOODGAN_LPIPS_WEIGHTS at the produced file.
"""

from __future__ import annotations

import sys

import numpy as np


def export(out_path: str) -> None:
    import lpips  # noqa: deferred heavy/optional import
    import torch

    net = lpips.LPIPS(net="alex")
    feats = net.net  # alexnet slices
    convs = [m for m in feats.modules() if isinstance(m, torch.nn.Conv2d)]
    lins = [net.lin0, net.lin1, net.lin2, net.lin3, net.lin4]
    out = {}
    for i, conv in enumerate(convs):
        out[f"conv{i}_w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}_w"] = w.transpose(2, 3, 1, 0)
    np.savez(out_path, **out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    export(sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz")
