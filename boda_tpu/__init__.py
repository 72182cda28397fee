"""boda_tpu — a TPU-native CNN framework with the capabilities of Boda.

Reference: TUD-UCB-Boda/boda-1 (see SURVEY.md). This is a ground-up redesign
for TPU: JAX/XLA/Pallas for the compute path, jax.sharding for distribution.

Layer map (mirrors SURVEY.md section 1, redesigned TPU-first):
  utils/    - lexp config values, named-dim arrays, timers, digests (ref L0/L1)
  config    - declarative config schema + registry + CLI (ref NESI, L1/L2)
  rtc/      - compute-backend abstraction: tpu (Pallas/XLA) + interp oracle (ref L3)
  ops/      - op signatures, Pallas kernel generators, tuning space (ref L4/L5)
  graph/    - dataflow-graph IR, shape/support inference, autodiff, lowering (ref L5/L6)
  frontend/ - prototxt/caffemodel parsing, net surgery (ref L7)
  models/   - programmatic net zoo (alexnet/NiN/googlenet/VGG/ResNet/...) (ref nets/)
  parallel/ - device-mesh sharding, distributed inference/training step
  prof/     - ops-prof autotuner, wisdom store, flops/roofline reports (ref L11)
  apps/     - predict, pyramid packing, scoring, data streams (ref L8-L10)
"""

__version__ = "0.1.0"
