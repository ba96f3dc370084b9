"""oaprogressionmmf_tpu — TPU-native multimodal knee-OA progression framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
imedslab/OAProgressionMMF ("koafusion", Panfilov et al., IEEE JBHI 2025):
end-to-end prediction of knee osteoarthritis progression from X-ray, MRI
(SAG 3D DESS / COR IW TSE / SAG T2 map), and clinical variables.

Layer map (mirrors the reference's 6 layers, re-designed TPU-first):
  utils/     — metrics, CV splitting, seeding, medical-image IO, checkpointing
  ops/       — jittable device-side preprocessing + Pallas kernels
  models/    — flax ResNet/ResNeXt encoders, FeaT transformer, 6 fusion families
  data/      — OAI index/provider/dataset + host->device input pipeline
  parallel/  — jax.sharding Mesh utilities (data-parallel pjit over ICI)
  train/     — train state, optax schedules, trainers/evaluators
  run/       — CLI apps (train_prog_fus, eval_prog_fus, train_prog_clin, prep)
"""

__version__ = "0.1.0"
