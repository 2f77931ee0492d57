"""TPU-native anticipated visual-inertial estimation.

A brand-new JAX/XLA/Pallas framework with the capabilities of
plusk01/Anticipated-VINS-Mono (VINS-Mono + Carlone/Karaman ICRA'17
attention-and-anticipation feature selection), re-designed TPU-first:

- statically-shaped, batched, pure-functional sliding-window VIO backend
  (IMU preintegration + inverse-depth projection factors + marginalization
  prior; Schur-complement landmark elimination; LM trust region) as one
  jitted device step;
- the anticipation pipeline (future-horizon propagation, expected-information
  Omega accumulation, greedy submodular logdet feature selection) as batched
  on-device linear algebra;
- scale-out via `jax.sharding.Mesh` + `shard_map` (scenario batches sharded
  over chips, feature-candidate scoring reduced with `psum`).

Layer map mirrors SURVEY.md section 1 of the reference analysis; docstrings
cite reference files (path:line under /root/reference) for parity checking.
"""

from anticipated_vins_mono_tpu import ops, models, parallel, utils  # noqa: F401

__version__ = "0.1.0"
