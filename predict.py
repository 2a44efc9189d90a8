#!/usr/bin/env python
"""Batch inference CLI (serving path — no reference counterpart).

    python predict.py --pretrained_model_path model.ckpt \
        --inputs a.tif b.tif --output_dir out/ [--resize 512] [--mask]

Reads 9-channel input stacks (dataset_input TIFFs), runs the AOT-compiled
generator, writes post-flood PNG predictions (and optionally flood masks
via a segmentation checkpoint).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained_model_path", required=True)
    p.add_argument("--inputs", nargs="+", required=True, help="9-channel input stack TIFFs")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--resize", type=int, default=512)
    p.add_argument("--segmentation_model_path", default=None,
                   help="Also write flood masks from this segmentation checkpoint")
    p.add_argument("--batch_size", type=int, default=0, help="0 = all inputs in one batch")
    args = p.parse_args(argv)

    import numpy as np

    from floodgan_tpu.data import tiff
    from floodgan_tpu.serve import InferenceEngine

    os.makedirs(args.output_dir, exist_ok=True)
    batch = args.batch_size or len(args.inputs)
    engine = InferenceEngine.from_checkpoint(
        args.pretrained_model_path, batch_size=batch, image_size=args.resize
    )

    seg = None
    if args.segmentation_model_path:
        from floodgan_tpu.api.segmentation import SegmentationModel

        seg = SegmentationModel(
            pretrained_model_path=args.segmentation_model_path,
            train=False, skip_data=True, verbose=False, data_path=args.output_dir,
        )

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for start in range(0, len(args.inputs), batch):
        chunk = args.inputs[start : start + batch]
        stacks = np.stack(
            [np.asarray(tiff.imread(f), np.float32) for f in chunk]
        )
        x = engine.preprocess(stacks, resize=args.resize)
        outputs = np.asarray(engine.predict(x))
        for path, img in zip(chunk, outputs):
            name = os.path.splitext(os.path.basename(path))[0]
            out_png = os.path.join(args.output_dir, f"{name}_prediction.png")
            plt.imsave(out_png, np.clip(img, 0, 1))
            print(f"wrote {out_png}")
            if seg is not None:
                mask = np.asarray(seg.predict_mask(img[None]))[0, :, :, 0]
                mask_png = os.path.join(args.output_dir, f"{name}_floodmask.png")
                plt.imsave(mask_png, mask, vmin=0, vmax=1, cmap="gray")
                print(f"wrote {mask_png}")


if __name__ == "__main__":
    main()
