"""Model / data / training configuration with the three dataset presets.

The reference configures by editing module-level globals per subproject
(reference: geo-aware/train.py:21-54, knowledge-aware/train.py:21-54,
news-knowledge-aware/train.py:21-54 and */create_input_files.py constructor
kwargs).  Here the same values live in one dataclass tree with three presets,
so a single pipeline serves all three datasets.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (reference: */train.py:27-38, */models.py)."""

    variant: str  # "geo" | "knowledge" | "news"
    emb_dim: int = 300              # d_model (word/entity/fact embedding dim)
    decoder_ffn_dim: int = 512      # FFN width in the transformer decoder
    encoder_ffn_dim: int = 512      # FFN width in the context transformer encoders
    num_heads: int = 10             # heads per transformer layer (head_dim 30)
    num_layers: int = 3             # transformer layers (decoder and ctx encoders)
    dropout_dec: float = 0.2        # train.py:36 (class default 0.5 at models.py:219)
    dropout_enc: float = 0.2
    dropout_pos: float = 0.1
    # Image encoder (reference: */models.py:9-60)
    encoded_image_size: int = 14    # 14x14 grid -> 196 image tokens
    image_encoder_dim: int = 2048   # ResNet-101 final channel count
    # Entity type-embedding table: geo 1000x296, knowledge 1000x294, news 20x295
    # (reference: geo models.py:247, knowledge models.py:327, news models.py:310).
    type_vocab: int = 1000
    # Number of leading hand-crafted feature dims in the entity vector
    # (geo: 4 = dist/az_north/az_east/size; knowledge: 6 = + fact count,
    # fact indicator; news: 5 = count/headline/first_par/fact count/indicator).
    num_entity_feature_dims: int = 4
    # Predicate embedding table; 0 disables the fact path (geo variant).
    num_predicates: int = 0         # knowledge 3000, news 3500
    # News only: multiply entity vectors by the mean word embedding of the
    # entity-name words packed in feature columns 5..9
    # (reference: news models.py:127-133, news utils.py:232-244).
    entity_name_embedding: bool = False
    max_pos_len: int = 5000         # positional-encoding table length
    # Fused Pallas training attention with in-kernel PRNG attention-weight
    # dropout (kernels/flash_attention.py).  None = auto: on for TPU, off on
    # CPU (where the kernel would run under the slow Mosaic interpreter).
    use_flash_attention: Optional[bool] = None

    @property
    def has_facts(self) -> bool:
        return self.num_predicates > 0

    @property
    def type_emb_dim(self) -> int:
        return self.emb_dim - self.num_entity_feature_dims


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Offline prep + loader settings (reference: */create_input_files.py)."""

    base_name: str                   # file-naming protocol base name
    entity_context_size: int         # E (stored arrays have E+1 rows incl <unk_ent>)
    fact_context_size: int = 0       # F (0 = no facts); stored arrays have F+1 rows
    max_caption_len: int = 30        # captions longer than this are skipped at prep
    min_word_freq: int = 0
    img_size: int = 256
    # feature columns packed per entity row (after the leading row-index col)
    entity_feature_cols: Tuple[str, ...] = ("distance", "azimuth", "size", "type_index")
    entity_random_ranges: Tuple[Tuple[float, float], ...] = (
        (0.0, 1.0), (-179.0, 179.0), (0.0, 0.1), (0, 500),
    )
    fact_feature_cols: Tuple[str, ...] = ()
    fact_random_ranges: Tuple[Tuple[float, float], ...] = ()
    name_col: str = "name"
    # news packs 5 wordmap ids of the entity name into the feature row
    # (reference: news utils.py:232-244)
    pack_name_word_ids: bool = False
    max_name_part_count: int = 5
    # wordmap rule deltas (reference: news create_input_files.py:375-387)
    split_tokens_on_underscore: bool = False
    fold_entity_names_into_wordmap: bool = False
    # Stream batches from a HDF5 sidecar store instead of loading
    # the JSON/pkl sidecars into host RAM (data/streaming.py) — for
    # NYTimes800k-scale datasets.  Image tokens cache to disk, not RAM.
    streaming: bool = False

    @property
    def num_entity_rows(self) -> int:
        return self.entity_context_size + 1

    @property
    def num_fact_rows(self) -> int:
        return self.fact_context_size + 1 if self.fact_context_size else 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-driver settings (reference: */train.py:40-54)."""

    epochs: int = 120
    batch_size: int = 4
    encoder_lr: float = 1e-4
    decoder_lr: float = 4e-4
    grad_clip: float = 5.0           # per-element clamp, NOT norm clip (utils.py:75-85)
    max_epochs_since_improvement: int = 20
    lr_decay_every: int = 8          # decay when stale epochs % 8 == 0
    lr_decay_factor: float = 0.8
    fine_tune_encoder: bool = False
    # Opt-in reproduction of the reference's frozen-encoder side effect:
    # encoder.train() is called even when the encoder is frozen
    # (geo-aware/train.py:245), so batch-norm normalizes by batch stats and
    # updates the running buffers every step.  Off by default (the TPU-first
    # default caches frozen-encoder tokens once per split instead).
    bn_train_mode: bool = False
    print_freq: int = 100
    seed: int = 0
    # TPU-native additions
    compute_dtype: str = "bfloat16"  # matmul dtype inside the model
    # Hardware-PRNG dropout for the residual/positional/FFN dropouts of the
    # train step: the step's rng is rekeyed to the 'rbg' implementation, so
    # masks come from the XLA RngBitGenerator instruction instead of
    # ~100 VPU ops/element of threefry (the same cost class the flash
    # attention kernel eliminated for attention-weight dropout).  None =
    # auto: on for TPU backends, off on CPU.
    use_rbg_dropout: Optional[bool] = None
    # Split each global batch into this many sequential microbatches INSIDE
    # the jitted step (lax.scan), accumulating gradients in-graph and
    # applying ONE optimizer update per batch.  Semantics are exact, not
    # approximate: the update equals the full-batch gradient of
    # (summed NLL / total token count), so results are invariant to the
    # split up to float associativity and per-microbatch dropout draws
    # (tests/test_grad_accum.py pins equality at dropout 0).  Peak
    # activation memory scales ~1/N — the lever for large effective
    # batches, or image-carrying fine-tune steps, on one chip.  Batches
    # not divisible by N are zero-padded in-graph (padded rows carry zero
    # valid tokens and contribute nothing).  Incompatible with
    # bn_train_mode (batch statistics are defined over the full batch).
    # "auto" (the DEFAULT) deploys the measured per-preset throughput table
    # (geo 8, knowledge 2, news 8 — +18.5%/+5%/+8.6% at batch 256 on v5e,
    # benchmarks/grad_accum_ab.py) on TPU at batch >= 256, and resolves to
    # 1 (monolithic) everywhere else — CPU and small batches train exactly
    # as before (train/step.py::resolve_grad_accum).  Pass 1 explicitly
    # (`--grad-accum 1`) for bit-reproducibility with pre-r5 TPU runs: the
    # accumulated step draws per-microbatch dropout keys, so the mask
    # stream differs from the monolithic step's (semantics stay exact).
    # Re-validate the table on new hardware with
    # benchmarks/revalidate_autos.py.
    grad_accum_steps: Union[int, str] = "auto"
    # When the train split's cached image tokens fit in this PER-CHIP
    # budget, keep the WHOLE cache in device HBM and ship only int32 row
    # ids per batch — the (B, 196, D) gather happens in-graph, so the
    # dominant data stream never crosses the host->device link
    # (~30 MB/step at batch 256).  Under a mesh the capacity POOLS over the
    # data axis: a cache bigger than one chip's budget but within
    # budget x data-axis-size is row-sharded over dp HBM and gathered via
    # an explicit ICI exchange (parallel/mesh.py::sharded_row_gather) —
    # NYTimes800k-scale splits (~90 GB bf16) fit an 8-chip v5e slice.
    # 0 disables.  Frozen-encoder training only.
    device_token_cache_gb: float = 4.0
    # Fault tolerance: also write the rolling mid-epoch STEP checkpoint
    # every N train batches (0 = epoch boundaries only).  Resume re-enters
    # the epoch at the exact next batch — bit-identical to an
    # uninterrupted run (tests/test_preempt_resume.py).
    checkpoint_every_steps: int = 0
    # Catch SIGTERM (the cloud preemption notice) during training: finish
    # the in-flight step, write the STEP checkpoint, return cleanly.
    # Single-process runs only (multi-process preemption is handled by the
    # interval checkpoints — a signal would hit processes mid-collective).
    save_on_preempt: bool = True
    data_axis: str = "data"          # mesh axis for batch sharding
    model_axis: str = "model"        # mesh axis for vocab/embedding sharding


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Inference settings (reference: */eval.py)."""

    max_caption_len: int = 30        # geo eval.py:131; knowledge/news use 40
    # Beam-5 is the flagship configuration every benchmark measures
    # (bench.py, BASELINE.md); 1 = greedy, the reference's only capability
    # (geo-aware/models.py:412).  The eval CLI with no flags therefore runs
    # the benchmarked configuration.
    beam_size: int = 5
    # Decode batch size.  None = flagship default by backend: 256 on TPU
    # (the configuration every headline benchmark measures — bench.py,
    # BASELINE.md), 64 on CPU.  The reference only supports batch 1
    # (geo-aware/eval.py:57-68); a no-flag eval run here IS the
    # benchmarked configuration.
    batch_size: Optional[int] = None
    # Fused decoder-step Pallas megakernel (kernels/decoder_step.py);
    # None = beam_decode's measured default.
    use_megakernel: Optional[bool] = None
    # "int8" stores beam-decode KV caches + precomputed cross-attention
    # K/V per-row-quantized (half the HBM payload); "int8_cross" quantizes
    # only the precomputed cross-attention K/V (decode/beam.py).  Round-4
    # controlled A/B at the batch-256 beam-5 production shapes
    # (benchmarks/int8_kv_ab.py, two independent sessions): "int8" is
    # +7% caps/s on news (M=598, the largest cross memory: 1216 vs 1142,
    # 1209 vs 1128), a wash on knowledge (M=548) and -9% on geo (M=64,
    # where the scale elementwise breaks the softmax->AV fusion and the
    # cross memory is too small to pay for it).  Default stays None
    # (bit-parity with the float pipeline); eval.py/serve.py --kv-dtype
    # int8 is the measured win for news serving, and "auto" resolves to
    # exactly that table per preset+backend (decode/beam.py
    # resolve_kv_dtype: int8 on news/TPU, float everywhere else).
    kv_dtype: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class Config:
    name: str
    model: ModelConfig
    data: DataConfig
    train: TrainConfig
    decode: DecodeConfig

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def georic() -> Config:
    """geo-aware preset (reference: geo-aware/train.py, create_input_files.py:341-356)."""
    return Config(
        name="georic",
        model=ModelConfig(
            variant="geo",
            type_vocab=1000,
            num_entity_feature_dims=4,
            num_predicates=0,
        ),
        data=DataConfig(
            base_name="geo_aware_georic2",
            entity_context_size=300,
            fact_context_size=0,
            max_caption_len=30,
            min_word_freq=0,
        ),
        train=TrainConfig(batch_size=4),
        decode=DecodeConfig(max_caption_len=30),
    )


def k_georic() -> Config:
    """knowledge-aware preset (reference: knowledge-aware/train.py,
    create_input_files.py:58-62,164-190)."""
    return Config(
        name="k_georic",
        model=ModelConfig(
            variant="knowledge",
            type_vocab=1000,
            num_entity_feature_dims=6,
            num_predicates=3000,
        ),
        data=DataConfig(
            base_name="knowledge_from_metadata",
            entity_context_size=300,
            fact_context_size=50,
            max_caption_len=100,
            min_word_freq=0,
            entity_random_ranges=((0.0, 10.0), (-179.0, 179.0), (0.0, 0.1), (0, 500)),
            fact_feature_cols=("subject_idx_in_entity_context", "predicate_idx"),
            fact_random_ranges=((300, 300), (0, 0)),
        ),
        train=TrainConfig(batch_size=4),
        decode=DecodeConfig(max_caption_len=40),
    )


def nytimes800k() -> Config:
    """news-knowledge-aware preset (reference: news-knowledge-aware/train.py,
    create_input_files.py:58-62,165-191)."""
    return Config(
        name="nytimes800k",
        model=ModelConfig(
            variant="news",
            type_vocab=20,
            num_entity_feature_dims=5,
            num_predicates=3500,
            entity_name_embedding=True,
        ),
        data=DataConfig(
            base_name="knowledge_from_metadata_nytimes",
            entity_context_size=100,
            fact_context_size=300,
            max_caption_len=50,
            min_word_freq=5,
            entity_feature_cols=(
                "count", "in_headline", "in_first_paragraph", "type", "name_processed",
            ),
            entity_random_ranges=((0, 0), (0, 0), (0, 0), (0, 0), (0, 0)),
            fact_feature_cols=("subject_idx_in_entity_context", "predicate_idx"),
            fact_random_ranges=((100, 100), (0, 0)),
            name_col="name_processed",
            pack_name_word_ids=True,
            split_tokens_on_underscore=True,
            fold_entity_names_into_wordmap=True,
        ),
        train=TrainConfig(batch_size=3),
        decode=DecodeConfig(max_caption_len=40),
    )


def geometry_of(cfg: Config) -> str:
    return f"{cfg.model.emb_dim}x{cfg.model.num_heads}"


def apply_geometry(cfg: Config, geometry: str) -> Config:
    """Replace the transformer geometry for FROM-SCRATCH training.

    ``geometry`` is ``"<emb_dim>x<num_heads>"``.  The packed input files are
    geometry-independent (the entity type-embedding width is derived in-model
    as ``emb_dim - num_entity_feature_dims``), so any preset's data works with
    any geometry; checkpoints record their geometry and eval/serve re-apply
    it automatically.  NOT checkpoint-parity with the reference — its
    d_model=300 / 10 heads (*/train.py:27-38) is required to load or compare
    against reference checkpoints.  Measured v5e-1 sweep at batch 256
    (BASELINE.md): 256x8 trains +47% vs 300x10 (two full 128-lane tiles vs
    three part-filled ones); padding UP to 384/512 does not help.
    """
    try:
        emb_dim, num_heads = (int(v) for v in geometry.lower().split("x"))
    except ValueError:
        raise ValueError(
            f"geometry must be '<emb_dim>x<num_heads>', got {geometry!r}"
        )
    if emb_dim <= 0 or num_heads <= 0 or emb_dim % num_heads:
        raise ValueError(
            f"geometry {geometry!r}: emb_dim must be a positive multiple "
            f"of num_heads"
        )
    if emb_dim <= cfg.model.num_entity_feature_dims:
        raise ValueError(
            f"geometry {geometry!r}: emb_dim must exceed the "
            f"{cfg.model.num_entity_feature_dims} entity feature dims"
        )
    return cfg.replace(
        model=dataclasses.replace(
            cfg.model, emb_dim=emb_dim, num_heads=num_heads
        )
    )


def resolve_geometry(cfg: Config, meta: Optional[dict] = None,
                     flag: Optional[str] = None,
                     log=print) -> Config:
    """Eval/serve-side geometry resolution: an explicit ``--geometry`` flag
    wins (it must agree with the checkpoint when the checkpoint recorded
    one); otherwise the checkpoint meta's geometry is re-applied so a
    ``--geometry``-trained model evaluates without repeating the flag."""
    recorded = (meta or {}).get("geometry")
    # Normalize before comparing: apply_geometry lowercases, so "256X8"
    # and "256x8" are the same geometry and must not be rejected as a
    # conflict.
    flag = flag.strip().lower() if flag else flag
    if flag and recorded and flag != recorded:
        raise ValueError(
            f"--geometry {flag} conflicts with the checkpoint's recorded "
            f"geometry {recorded}"
        )
    want = flag or recorded
    if want and want != geometry_of(cfg):
        log(f"geometry: {want} "
            f"({'flag' if flag else 'from checkpoint meta'})")
        return apply_geometry(cfg, want)
    return cfg


def georic_fast() -> Config:
    """georic with the measured-fastest from-scratch geometry (256x8).

    +47% train throughput vs the reference 300x10 at batch 256 on v5e-1
    with -28% transformer params (BASELINE.md geometry sweep); quality must
    be re-established by training — this preset cannot load or be compared
    bit-for-bit against reference checkpoints (use ``georic`` for parity).
    Reads/writes the same ``geo_aware_georic2`` input files.
    """
    cfg = apply_geometry(georic(), "256x8")
    return dataclasses.replace(cfg, name="georic_fast")


PRESETS = {
    "georic": georic,
    "k_georic": k_georic,
    "nytimes800k": nytimes800k,
    "georic_fast": georic_fast,
}


def get_config(name: str) -> Config:
    return PRESETS[name]()
