"""icek_tpu — TPU-native image captioning with external knowledge.

A single JAX/XLA/Pallas framework re-implementing, TPU-first, the
capabilities of the reference `sonniki/image-captioning-with-external-knowledge`
(three sibling PyTorch pipelines: geo-aware / knowledge-aware /
news-knowledge-aware).  One parameterized model family, three dataset presets:

    - ``georic``       (geo-aware:   geographic entity context)
    - ``k_georic``     (knowledge-aware: geo entities + encyclopedic facts)
    - ``nytimes800k``  (news-knowledge-aware: article entities + facts)

Layout:
    core/      configs + presets, mesh/sharding, rng
    data/      codecs (wordmap, char codec, context packing, caption encoding),
               offline input-file construction, streaming loader
    models/    image encoder (ResNet-101), entity/fact encoders, caption
               embedder, transformer stack, copy/pointer scoring head
    train/     jitted train step, optimizer, epoch driver, checkpointing
               (incl. a torch .pth.tar importer)
    decode/    on-device greedy + beam decoding (lax.scan, KV cache),
               detokenization
    metrics/   BLEU/CIDEr/METEOR/ROUGE (vendored), Jensen-Shannon geo metric,
               fact accuracy, named-entity precision/recall
    kernels/   Pallas TPU kernels for the fused hot ops
    parallel/  device-mesh utilities (dp/tp shardings over ICI)
"""

__version__ = "0.1.0"
