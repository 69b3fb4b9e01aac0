#!/usr/bin/env python
"""Convert torchvision resnet101 weights into an icek_tpu encoder tree.

The reference starts every fresh training run from the ImageNet-pretrained
torchvision body (``torchvision.models.resnet101(pretrained=True)``,
geo-aware/models.py:14-16, built at geo-aware/train.py:90) with a fresh 1x1
projection conv on top.  This tool is the icek_tpu equivalent: feed it the
state_dict ``.pth`` of that model (downloaded once on any machine with
torchvision, e.g. ``torch.save(resnet101(weights=...).state_dict(), f)``)
and it writes a ``.msgpack`` encoder tree for ``train.py --encoder-weights``.

    python tools/port_torchvision_encoder.py resnet101-imagenet.pth \\
        encoder_imagenet.msgpack [--emb-dim 300] [--seed 0]

The 1x1 projection (2048 -> emb_dim) is freshly initialized from ``--seed``
when the input carries none — it is always trained from scratch, exactly as
the reference does.  Accepts raw torchvision names, ``{"state_dict": ...}``
wrappers, pickled modules, and the reference Encoder's ``resnet.<idx>``
naming.  ``train.py --encoder-weights`` also accepts the ``.pth`` directly;
this tool just makes the conversion a one-time artifact.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("weights", help="torch file: state_dict .pth, "
                                   "{'state_dict': ...} wrapper, or module")
    p.add_argument("output", help="output .msgpack encoder tree")
    p.add_argument("--emb-dim", type=int, default=300,
                   help="projection width (the model's d_model; 300 for "
                        "every reference preset)")
    p.add_argument("--seed", type=int, default=0,
                   help="rng seed for the fresh 1x1 projection")
    args = p.parse_args(argv)

    from icek_tpu.train import checkpoint as ckpt
    from icek_tpu.train import port

    tree = port.load_torchvision_encoder(args.weights, args.emb_dim, args.seed)
    import jax
    import numpy as np

    leaves = jax.tree.leaves(tree)
    nbytes = sum(np.asarray(x).nbytes for x in leaves)
    ckpt.save_encoder_tree(
        args.output, tree,
        meta={"source": os.path.basename(args.weights),
              "emb_dim": args.emb_dim, "proj_seed": args.seed},
    )
    print(f"wrote {args.output}: {len(leaves)} arrays, "
          f"{nbytes / 2**20:.1f} MiB (emb_dim={args.emb_dim})")


if __name__ == "__main__":
    main()
