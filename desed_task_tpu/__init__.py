"""desed_task_tpu: TPU-native sound event detection framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
DCASE-REPO/DESED_task (DCASE Challenge Task 4 baselines 2021-2024):
polyphonic sound event detection with CRNNs, mean-teacher semi-supervised
training over heterogeneous datasets, frozen pretrained audio embeddings
(BEATs/PANNs/AST), and PSDS / collar-F1 / segment-pAUC evaluation.

Layering (bottom-up, see SURVEY.md §7):
  ops/        fused mel front-end, GRU scan kernels, median filter, augment ops
  labels/     ManyHotEncoder / CatManyHotEncoder frame-grid label codec
  data/       host-side datasets, fixed-slot multi-source batching, wav io
  models/     CRNN, BEATs, PANNs CNN14, AST (flax)
  training/   mean-teacher trainer (jit train step over a device mesh)
  inference/  batched predict, on-device median filter + threshold sweep
  metrics/    PSDS, event/segment/intersection F1, pAUC (own implementations)
  parallel/   mesh construction and sharding helpers
  obs/        logging, checkpointing, energy & MACs accounting
"""

__version__ = "0.1.0"
