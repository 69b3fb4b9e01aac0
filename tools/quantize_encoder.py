#!/usr/bin/env python
"""Calibrate + persist an int8 PTQ tree for the frozen ResNet encoder.

Post-training quantization (models/resnet_int8.py) needs representative
activation statistics; this tool runs the folded bf16 encoder over N batches
of a prepared split, records the per-tensor maxima, quantizes, and writes
the resulting tree as msgpack.  The tree is a model artifact — ship it next
to the checkpoint and pass it to ``eval.py``/``serve.py --encoder-qtree``.

    python tools/quantize_encoder.py --preset georic \\
        --checkpoint BEST_checkpoint_georic.msgpack \\
        --data-dir img_caption_data/input_dataset_files \\
        --split VAL --batches 8 --output encoder_int8_georic.msgpack

The reference has no quantized path (encoder at geo-aware/models.py:24-46,
always fp32); this is a beyond-reference serving optimization.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--preset", required=True,
                   help="georic | k_georic | nytimes800k")
    p.add_argument("--checkpoint", required=True, help=".msgpack checkpoint")
    p.add_argument("--data-dir", default="img_caption_data/input_dataset_files")
    p.add_argument("--split", default="VAL", choices=["TRAIN", "VAL", "TEST"],
                   help="split to draw calibration batches from (default "
                        "VAL — never calibrate on TEST when TEST is what "
                        "you report)")
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--calib-mode", default="max",
                   choices=["max", "percentile"],
                   help="activation-scale statistic: 'max' (running max — "
                        "exact range, but one outlier image inflates the "
                        "scale for everyone) or 'percentile' (percentile "
                        "over per-image maxima — outlier images are "
                        "outvoted; needs enough images for the percentile "
                        "to bind)")
    p.add_argument("--percentile", type=float, default=99.5,
                   help="percentile for --calib-mode percentile")
    p.add_argument("--output", required=True, help="output .msgpack path")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from icek_tpu.core import config as config_lib
    from icek_tpu.data import dataset as ds
    from icek_tpu.models import resnet, resnet_int8
    from icek_tpu.train import checkpoint as ckpt_lib

    cfg = config_lib.get_config(args.preset)
    _, _, encoder_params, _ = ckpt_lib.load_checkpoint(args.checkpoint)
    if encoder_params is None:
        raise SystemExit("checkpoint carries no encoder params")
    data = ds.CaptionDataset(
        args.data_dir, cfg.data.base_name, args.split, cfg.model.has_facts
    )
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    folded = resnet.fold_bn_params(encoder_params)

    def batches():
        for b in range(args.batches):
            idx = np.arange(
                b * args.batch_size, min((b + 1) * args.batch_size, len(data))
            )
            if len(idx) == 0:
                return
            yield jnp.asarray(data.batch(idx)["images"])

    print(f"calibrating on up to {args.batches} x {args.batch_size} "
          f"{args.split} images ({len(data)} available)", flush=True)
    qtree = resnet_int8.calibrate_and_quantize(
        folded, batches(), dtype, source_params=encoder_params,
        mode=args.calib_mode, percentile=args.percentile,
    )
    resnet_int8.save_qtree(qtree, args.output)
    size_mb = os.path.getsize(args.output) / 1e6
    print(f"wrote {args.output} ({size_mb:.1f} MB int8 tree; bf16 encoder "
          f"weights are ~2x that)")


if __name__ == "__main__":
    main()
