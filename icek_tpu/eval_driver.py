"""Batched evaluation driver: TEST split -> captions CSV + domain metrics.

The TPU-native replacement for the reference's eval.py scripts
(geo-aware/eval.py:46-131, knowledge-aware/eval.py:49-200,
news-knowledge-aware/eval.py:53-175): instead of a batch-1 Python loop with
per-step host re-decoding, images are encoded and decoded in large static
batches fully on device (greedy or beam), and only detokenization + CSV
writing + metric accumulation stay on host.

Output contract preserved per preset:
  * ``generated_captions.csv`` with a ``generated_caption`` column
    (news adds ``generated_mask``);
  * knowledge also writes ``generated_captions_random_facts.csv`` (the
    random-fact-object baseline) and prints both fact-accuracy reports;
  * geo feeds the Jensen-Shannon metric online.
"""

from __future__ import annotations

import random as _random
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from icek_tpu.core.config import Config
from icek_tpu.data import dataset as ds
from icek_tpu.data.codec import UNK_FACT, Wordmap
from icek_tpu.decode import beam as beam_lib
from icek_tpu.decode import detok
from icek_tpu.decode import greedy as greedy_lib
from icek_tpu.models import resnet


def resolve_eval_batch_size(batch_size: Optional[int], cfg: Config) -> int:
    """Explicit arg > preset value > flagship default by backend.

    A no-flag eval run must be the benchmarked flagship configuration
    (batch 256, beam 5 on TPU — BASELINE.md); CPU defaults to 64 so the
    test-suite shapes stay small."""
    if batch_size is not None:
        return batch_size
    if cfg.decode.batch_size is not None:
        return cfg.decode.batch_size
    return 64 if jax.default_backend() == "cpu" else 256


def _pad_batch(idx: np.ndarray, batch_size: int) -> np.ndarray:
    if len(idx) < batch_size:
        return np.concatenate([idx, np.full(batch_size - len(idx), idx[-1])])
    return idx


class Evaluator:
    def __init__(
        self,
        cfg: Config,
        wordmap: Wordmap,
        params,
        encoder_params,
        batch_size: Optional[int] = None,
        beam_size: Optional[int] = None,
        compute_dtype=None,
        mesh=None,
        encoder_qtree=None,
    ):
        """With ``mesh`` the evaluation is SPMD over the device mesh:
        params replicate (decode is bandwidth-bound data-parallel serving),
        each batch shards over the mesh's data axis, and the decoded ids
        replicate back so the primary process does all host-side work
        (detok, metrics, CSV).  Multi-process runs feed each process's
        LOCAL rows to :meth:`run` via the loader sharding, mirroring the
        training data path (parallel/mesh.py::global_batch)."""
        self.cfg = cfg
        self.wordmap = wordmap
        self.mesh = mesh
        if mesh is not None:
            from icek_tpu.parallel import mesh as mesh_lib

            self._mesh_lib = mesh_lib
            params = mesh_lib.replicate(params, mesh)
            if encoder_params is not None:
                encoder_params = mesh_lib.replicate(encoder_params, mesh)
        self.params = params
        self.encoder_params = encoder_params
        self.batch_size = resolve_eval_batch_size(batch_size, cfg)
        if mesh is not None and self.batch_size % jax.process_count():
            raise ValueError(
                f"eval batch size {self.batch_size} is not divisible by "
                f"process count {jax.process_count()}"
            )
        self.beam_size = beam_size if beam_size is not None else cfg.decode.beam_size
        if compute_dtype is None:
            compute_dtype = (
                jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
            )
        self.compute_dtype = compute_dtype
        # Frozen-encoder fast path for the production (bf16) mode: BN
        # affines folded into conv weights (resnet.fold_bn_params).  The
        # f32 mode keeps the exact unfolded path (bit-parity tests).
        self._encoder_folded = (
            resnet.fold_bn_params(encoder_params)
            if encoder_params is not None and compute_dtype != jnp.float32
            else None
        )
        # Opt-in int8 PTQ encoder (models/resnet_int8.py): an already
        # calibrated+quantized tree — changes arithmetic, so it is never
        # auto-enabled; build one with resnet_int8.calibrate_and_quantize
        # on representative batches and persist it with the checkpoint.
        if encoder_qtree is not None and encoder_params is not None:
            # a qtree bakes the weights in — reject one quantized from a
            # different checkpoint before it silently serves wrong encodings
            from icek_tpu.models import resnet_int8

            resnet_int8.verify_qtree(encoder_qtree, encoder_params)
        if encoder_qtree is not None and mesh is not None:
            encoder_qtree = mesh_lib.replicate(encoder_qtree, mesh)
        self._encoder_qtree = encoder_qtree
        # image-encode + context/memory prep + decode fused into one jitted
        # executable per input signature (separate jits pay a dispatch
        # boundary each; fusing measured ~1.5x end-to-end on v5e)
        self._fused = {}

    def _encode_tokens(self, images_or_tokens, mode: str):
        """The pipeline's encoder branch (traced inside a jit): raw f16
        CHW rows or host-normalized images -> (B, P, D) token features,
        via whichever encoder variant this Evaluator runs (int8 qtree >
        folded bf16 > exact f32)."""
        from icek_tpu.data import images as image_ops

        cfg = self.cfg
        if mode == "tokens":
            return images_or_tokens
        if mode == "raw":
            # f16 CHW rows straight off HDF5: /255 + ImageNet
            # normalize + NHWC transpose fuse into the first conv
            images_or_tokens = image_ops.normalize_in_graph(images_or_tokens)
        if self._encoder_qtree is not None:
            from icek_tpu.models import resnet_int8

            return resnet_int8.resnet_encode_int8(
                self._encoder_qtree, images_or_tokens,
                cfg.model.encoded_image_size,
                compute_dtype=self.compute_dtype,
            )
        if self._encoder_folded is not None:
            return resnet.resnet_encode_folded(
                self._encoder_folded, images_or_tokens,
                cfg.model.encoded_image_size,
                compute_dtype=self.compute_dtype,
            )
        return resnet.resnet_encode(
            self.encoder_params, images_or_tokens,
            cfg.model.encoded_image_size,
            compute_dtype=self.compute_dtype,
        )

    def encoder_fingerprint(self) -> str:
        """Content hash of whatever produces this Evaluator's image tokens
        (active encoder tree + compute dtype + pool size) — the binding key
        for cached-token artifacts."""
        from icek_tpu.utils.fingerprint import tree_fingerprint

        tree = (
            self._encoder_qtree
            if self._encoder_qtree is not None
            else (self._encoder_folded
                  if self._encoder_folded is not None
                  else self.encoder_params)
        )
        kind = ("qtree" if self._encoder_qtree is not None else
                "folded" if self._encoder_folded is not None else "exact")
        return tree_fingerprint(tree, extra=(
            kind, jnp.dtype(self.compute_dtype).name,
            self.cfg.model.encoded_image_size,
        ))

    def cache_split_tokens(self, data: ds.CaptionDataset, cache_path: str,
                           log: Callable[[str], None] = print) -> str:
        """Encode ``data``'s images once and persist the tokens; later
        invocations load them and skip the encoder + image IO entirely
        (metric-iteration workflow: the e2e eval bottleneck is the
        ~100 MB/batch image stream, BASELINE.md).  The cache records the
        encoder fingerprint; a cache built under a different checkpoint /
        encoder variant / compute dtype re-encodes instead of silently
        serving stale features.  Tokens are stored f32 (exact for both the
        f32 CPU and bf16 TPU pipelines — bf16 values round-trip through
        f32), so cached-token captions are token-identical to the image
        path (tests/test_eval_driver.py).  Returns "loaded" or "encoded".

        Streaming datasets cache to a disk-backed HDF5 file in the
        streaming sidecar layout instead of an in-RAM .npz (the news-scale
        split whose re-encodes are slowest is exactly the one that needs
        ``--streaming``; host RAM never holds the full tokens), with the
        same fingerprint binding stored as a root attr."""
        import os

        fp = self.encoder_fingerprint()
        from icek_tpu.data import streaming as streaming_lib

        streaming = isinstance(data, streaming_lib.StreamingCaptionDataset)

        def loaded():
            log(f"token cache: loaded {cache_path} "
                f"({len(data)} rows, encoder {fp[:12]})")
            return "loaded"

        def encode_split(**cache_kwargs):
            # one encode feed for both cache layouts: a divergence here
            # would silently split the streaming and in-memory caches
            encode = jax.jit(partial(self._encode_tokens, mode="raw"))
            data.cache_image_tokens(
                lambda raw: encode(jnp.asarray(raw)),
                batch_size=self.batch_size, dtype=np.float32, raw=True,
                **cache_kwargs,
            )
            log(f"token cache: encoded + saved {cache_path} "
                f"({len(data)} rows, encoder {fp[:12]})")
            return "encoded"

        if streaming:
            if (
                data.open_token_cache(cache_path)
                and data.token_cache_attrs.get("fingerprint") == fp
                and len(data.image_tokens) == len(data)
            ):
                return loaded()
            if data.image_tokens is not None:
                log("token cache: stale (different encoder/length) — "
                    "re-encoding")
            return encode_split(path=cache_path, attrs={"fingerprint": fp})
        if os.path.exists(cache_path):
            with np.load(cache_path) as z:
                if (str(z["fingerprint"]) == fp
                        and len(z["tokens"]) == len(data)):
                    data.image_tokens = z["tokens"]
                    return loaded()
            log("token cache: stale (different encoder/length) — re-encoding")
        result = encode_split()
        tmp = cache_path + ".tmp.npz"  # .npz suffix: savez appends it otherwise
        np.savez(tmp, tokens=data.image_tokens, fingerprint=fp)
        os.replace(tmp, cache_path)
        return result

    def _pipeline(self, mode: str, num_entity_rows: int):
        """``mode``: "raw" (stored f16 CHW rows, normalized in-graph — the
        default loader path), "images" (host-normalized NHWC f32, kept for
        direct ``decode_batch`` callers), or "tokens" (cached encoder
        features)."""
        key = (mode, num_entity_rows)
        if key in self._fused:
            return self._fused[key]
        cfg = self.cfg
        wm = self.wordmap
        jit = jax.jit
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # decoded ids replicate so every process (and the host loop on
            # the primary) sees the full batch
            jit = partial(
                jax.jit,
                out_shardings=NamedSharding(self.mesh, PartitionSpec()),
            )

        @jit
        def run(images_or_tokens, ents, facts):
            tokens = self._encode_tokens(images_or_tokens, mode)
            ctx = greedy_lib.prepare_decode_context(
                self.params, cfg.model, tokens, ents, facts,
                compute_dtype=self.compute_dtype,
            )
            if self.beam_size <= 1:
                return greedy_lib.greedy_decode(
                    self.params, cfg.model, len(wm), num_entity_rows,
                    wm.start_id, wm.end_id, wm.pad_id, ctx,
                    cfg.decode.max_caption_len,
                    compute_dtype=self.compute_dtype,
                )
            out, _ = beam_lib.beam_decode(
                self.params, cfg.model, len(wm), num_entity_rows,
                wm.start_id, wm.end_id, wm.pad_id, ctx,
                cfg.decode.max_caption_len, beam_size=self.beam_size,
                compute_dtype=self.compute_dtype,
                use_megakernel=cfg.decode.use_megakernel,
                kv_dtype=cfg.decode.kv_dtype,
            )
            return out

        self._fused[key] = run
        return run

    def decode_batch(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """One static-shape batch -> (B, max_len) extended-vocab ids.

        With a mesh the batch holds this process's LOCAL rows; they are
        assembled into data-sharded global arrays first (every process
        must call this in lockstep — the decode is a collective program)."""
        return np.asarray(self.decode_batch_async(batch))

    def decode_batch_async(self, batch: Dict[str, np.ndarray]):
        """:meth:`decode_batch` without the host sync: returns the decoded
        ids as a device array right after dispatch.  The serving engine
        uses this so its batcher thread can coalesce the next batch while
        the device executes this one; ``np.asarray`` the result to wait."""
        num_ent_rows = batch["entity_features"].shape[1]
        if self.mesh is not None:
            batch = self._mesh_lib.global_batch(batch, self.mesh)
        mode = next(
            m for m, k in (
                ("raw", "raw_images"),
                ("tokens", "image_tokens"),
                ("images", "images"),
            ) if k in batch
        )
        inputs = jnp.asarray(
            batch[{"raw": "raw_images", "tokens": "image_tokens",
                   "images": "images"}[mode]]
        )
        facts = (
            jnp.asarray(batch["fact_features"])
            if batch.get("fact_features") is not None
            else None
        )
        run = self._pipeline(mode, num_ent_rows)
        return run(inputs, jnp.asarray(batch["entity_features"]), facts)

    def run(
        self,
        data: ds.CaptionDataset,
        js_metric=None,
        fact_metric=None,
        predicate_to_objects: Optional[Dict[str, List[str]]] = None,
        output_csv: str = "generated_captions.csv",
        log: Callable[[str], None] = print,
        rng: Optional[_random.Random] = None,
    ) -> Dict[str, object]:
        cfg = self.cfg
        rng = rng or _random
        n = len(data)
        captions: List[str] = []
        masks: List[List[int]] = []
        random_baseline: List[str] = []
        num_entities = num_facts = caps_with_entities = caps_with_facts = 0
        pi, pc = jax.process_index(), jax.process_count()
        primary = pi == 0

        def batches():
            for start in range(0, n, self.batch_size):
                idx = _pad_batch(
                    np.arange(start, min(start + self.batch_size, n)),
                    self.batch_size,
                )
                if pc > 1:
                    # each process reads only the rows its devices own;
                    # decode_batch reassembles the global batch
                    local = self.batch_size // pc
                    idx = idx[pi * local : (pi + 1) * local]
                yield start, data.batch(idx, raw_images=True)

        # overlap host-side HDF5 read + normalization with device decode;
        # on an accelerator without a mesh also jax.device_put on the
        # prefetch thread — leaving numpy would serialize the 100 MB image
        # upload into every decode dispatch (mesh batches are assembled in
        # decode_batch from the LOCAL numpy rows instead)
        if self.mesh is None and jax.default_backend() != "cpu":
            stage = lambda item: (item[0], jax.device_put(item[1]))  # noqa: E731
        else:
            stage = lambda item: item  # noqa: E731
        prefetched = ds.prefetch(batches(), stage)
        for start, batch in prefetched:
            out = self.decode_batch(batch)
            count = min(self.batch_size, n - start)
            if not primary:
                # non-primary processes only drive the collective decode;
                # detok/metrics/CSV are single-writer on the primary
                continue
            for b in range(count):
                i = start + b
                ent_names = data.arrays.entity_names[i]
                fact_names = (
                    data.arrays.fact_names[i]
                    if data.arrays.fact_names is not None
                    else None
                )
                tokens, kinds = detok.detokenize(
                    out[b], self.wordmap, ent_names, fact_names
                )
                raw_text = " ".join(tokens)
                text = detok.trim_trailing_sentence(raw_text)
                captions.append(text)
                masks.append(kinds)
                if 1 in kinds:
                    caps_with_entities += 1
                    num_entities += sum(1 for k in kinds if k == 1)
                if 2 in kinds:
                    caps_with_facts += 1
                    num_facts += sum(1 for k in kinds if k == 2)
                if js_metric is not None:
                    js_metric.run(
                        [int(t) for t in out[b]],
                        data.arrays.entity_features[i],
                        ent_names,
                    )
                if predicate_to_objects is not None and fact_names is not None:
                    # Trim in lockstep with the main caption: the reference
                    # evaluates the trim condition on the main caption and
                    # applies it to both (knowledge-aware/eval.py:169-172).
                    random_baseline.append(
                        detok.trim_lockstep(
                            raw_text,
                            _random_fact_caption(
                                tokens, kinds, fact_names,
                                predicate_to_objects, rng,
                            ),
                        )
                    )

        if not primary:
            return {"captions": None, "masks": None, "primary": False}
        self._write_csv(output_csv, captions, masks)
        results: Dict[str, object] = {"captions": captions, "masks": masks}
        if random_baseline:
            self._write_csv(
                output_csv.replace(".csv", "_random_facts.csv"), random_baseline
            )
            results["random_baseline"] = random_baseline
        if js_metric is not None:
            results["js"] = js_metric.results()
        if fact_metric is not None:
            log("\nKNOWLEDGE-AWARE:")
            results["fact_accuracy"] = fact_metric.run(captions, log=log)
            if random_baseline:
                log("\nRANDOM FACT OBJECT BASELINE:")
                results["fact_accuracy_random"] = fact_metric.run(
                    random_baseline, log=log
                )
        if cfg.model.variant == "news":
            ratio_e = round(caps_with_entities * 100 / max(n, 1), 2)
            ratio_f = round(caps_with_facts * 100 / max(n, 1), 2)
            log(f"Captions with entities: {caps_with_entities} out of {n}, {ratio_e}%")
            log(f"Captions with facts: {caps_with_facts} out of {n}, {ratio_f}%")
            log(
                "Number of generated entities (both from E and K) per caption: "
                f"{round((num_entities + num_facts) / max(n, 1), 2)}"
            )
        return results

    def _write_csv(self, path: str, captions: List[str], masks=None):
        import pandas as pd

        data = {"generated_caption": captions}
        if self.cfg.model.variant == "news" and masks is not None:
            data["generated_mask"] = masks
        pd.DataFrame(data).to_csv(path, index=False)


def _random_fact_caption(
    tokens: List[str],
    kinds: List[int],
    fact_names: np.ndarray,
    predicate_to_objects: Dict[str, List[str]],
    rng,
) -> str:
    """Random-fact-object baseline caption (knowledge-aware/eval.py:81-156):
    replace each generated fact token with a random same-type object (shares
    a predicate in the corpus) from the image's knowledge context.  Returned
    UNTRIMMED — the caller trims it in lockstep with the main caption."""
    from icek_tpu.metrics.fact_accuracy import is_year

    years, others = [], []
    for row in fact_names[:-1]:
        obj = detok.name_from_row(row)
        if obj not in others and obj not in years:
            (years if is_year(obj) else others).append(obj)
    out = []
    for tok, kind in zip(tokens, kinds):
        if kind != 2:
            out.append(tok)
            continue
        if is_year(tok):
            out.append(rng.choice(years) if years else UNK_FACT)
            continue
        if not others:
            out.append(UNK_FACT)
            continue
        same_type = [tok]
        for objects in predicate_to_objects.values():
            if tok in objects:
                same_type.extend(
                    x for x in objects if x != tok and x in others
                )
        out.append(rng.choice(same_type) if same_type else UNK_FACT)
    return " ".join(out)
