"""mfar_tpu: a TPU-native multi-field adaptive retrieval framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
microsoft/multifield-adaptive-retrieval (mFAR, ICLR 2025):

- Semi-structured documents decomposed into named fields; each field gets a
  dense embedding from a shared text encoder and/or a per-field BM25 sparse
  score, fused by query-conditioned softmax field weights.
- Per-field corpus embeddings live as HBM-resident ``[F, N, E]`` device arrays
  sharded over a TPU mesh; query scoring is a fused XLA/Pallas program
  (field-wise dots folded into one MXU matmul + learned mixing + host-streamed
  sparse scores + distributed top-k over ICI).
- Contrastive training (in-batch + BM25-mined hard negatives, split
  encoder/weights learning rates) compiles to a single pjit step.

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):

- ``mfar_tpu.data``     -- corpus/query/field types, TREC I/O, schemas, formatters
- ``mfar_tpu.sparse``   -- BM25 engine (native C++ or scipy CSR), stemmer, tokenizer
- ``mfar_tpu.models``   -- Flax encoder (Contriever-compatible BERT), HF weight import
- ``mfar_tpu.ops``      -- fused multi-field scoring, top-k, mixing kernels
- ``mfar_tpu.parallel`` -- device mesh, sharding rules, distributed top-k
- ``mfar_tpu.train``    -- losses, train step, optimizers, checkpointing, data pipeline
- ``mfar_tpu.eval``     -- retrieval (exact + rerank-compat), trec metrics
- ``mfar_tpu.commands`` -- CLI entry points (train, mask_fields, index build, ...)
"""

__version__ = "0.1.0"
