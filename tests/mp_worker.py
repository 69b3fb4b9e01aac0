"""Real multi-process training worker, launched by test_multiprocess_real.

Exercises the ACTUAL multi-host code path end-to-end (not the simulated
shard assembly): ``ICEK_*`` env vars -> ``distributed.maybe_initialize``
(``jax.distributed.initialize`` + gloo CPU collectives) -> a mesh over the
GLOBAL device set -> ``train_loop.train`` with per-process loader shards,
``jax.make_array_from_process_local_data`` batch assembly, cross-process
collectives in the train step, ``gather_for_host`` + primary-only
checkpoint writes.  Per-epoch losses are emitted via ICEK_METRICS_LOG for
cross-process and vs-single-process comparison.

After training, the worker also runs the distributed EVAL path: every
process loads the primary's checkpoint (shared storage), drives the
collective sharded decode over its local batch rows, and only the primary
writes the captions CSV.

Usage: mp_worker.py DATA_DIR CKPT_DIR OUT_JSON DATA_AX MODEL_AX PRIMARY_CKPT_DIR
(env: ICEK_COORDINATOR / ICEK_NUM_PROCESSES / ICEK_PROCESS_ID,
XLA_FLAGS=--xla_force_host_platform_device_count=N, ICEK_METRICS_LOG)
"""

import json
import os
import sys


def main():
    data_dir, ckpt_dir, out_json, data_ax, model_ax, primary_ckpt_dir = (
        sys.argv[1:7]
    )
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root
    sys.path.insert(0, here)  # tests dir (tiny_cfg fixture module)

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon tunnel overrides env
    from icek_tpu.parallel import distributed

    info = distributed.maybe_initialize()
    assert info.count == int(os.environ["ICEK_NUM_PROCESSES"]), info
    assert info.index == int(os.environ["ICEK_PROCESS_ID"]), info

    from icek_tpu.parallel import mesh as mesh_lib
    from icek_tpu.train import checkpoint as ckpt
    from icek_tpu.train import loop as train_loop
    from test_train_e2e import tiny_cfg

    cfg = tiny_cfg()
    with open(os.path.join(data_dir, "WORDMAP_tiny_geo.json")) as f:
        wm = json.load(f)
    mesh = mesh_lib.make_mesh(int(data_ax), int(model_ax))
    result = train_loop.train(
        cfg, data_dir, len(wm), wm["<pad>"], checkpoint_dir=ckpt_dir,
        max_epochs=2, log=lambda s: None, mesh=mesh,
    )
    latest = ckpt.latest_checkpoint(ckpt_dir, "tiny_geo")

    # ---- distributed eval: all processes drive the collective decode,
    # only the primary detokenizes + writes the CSV ----
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("primary checkpoint written")
    from icek_tpu import eval_driver
    from icek_tpu.data import dataset as ds_lib
    from icek_tpu.data.codec import Wordmap

    shared_ckpt = ckpt.latest_checkpoint(primary_ckpt_dir, "tiny_geo")
    eval_params, _, eval_enc, _ = ckpt.load_checkpoint(shared_ckpt)
    test_data = ds_lib.CaptionDataset(data_dir, "tiny_geo", "TEST")
    csv_path = os.path.join(ckpt_dir, "generated_captions.csv")
    os.makedirs(ckpt_dir, exist_ok=True)
    evaluator = eval_driver.Evaluator(
        cfg, Wordmap(wm), eval_params, eval_enc,
        batch_size=4, beam_size=1, mesh=mesh,
    )
    eval_res = evaluator.run(test_data, output_csv=csv_path,
                             log=lambda s: None)

    with open(out_json, "w") as f:
        json.dump(
            {
                "process": info.index,
                "process_count": info.count,
                "n_devices": len(jax.devices()),
                "n_local_devices": len(jax.local_devices()),
                "best_loss": float(result.best_loss),
                "epochs_run": result.epochs_run,
                "checkpoint": latest,
                "eval_csv": csv_path if os.path.exists(csv_path) else None,
                "eval_primary": eval_res.get("primary", True),
                "eval_captions": eval_res["captions"],
            },
            f,
        )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
