"""ministark_tpu — a TPU-native STARK proving framework.

A from-scratch reimplementation of the full capability surface of the reference
``alv-around/mini-stark`` Rust library (AIR arithmetization -> trace commitment ->
DEEP-ALI constraint linking -> DEEP-FRI low-degree test, Fiat-Shamir transcript,
Goldilocks/BabyBear fields with quadratic/quartic extensions), redesigned for TPU:

* bulk compute (field ops, NTT/LDE, FRI folding, constraint evaluation, hashing)
  runs as jitted JAX / Pallas programs over uint32 limb arrays,
* the sequential protocol state (Fiat-Shamir sponge, proof assembly, config math)
  stays host-side,
* multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives (reference has no parallelism at all; see SURVEY.md §2.3).

Layer map (mirrors SURVEY.md §1):
  fields/     L0 field arithmetic            (reference: src/field.rs + ark-ff)
  poly/       L1 polynomials / FFT domains   (reference: ark-poly)
  commit/     L2 hash / Merkle commitment    (reference: src/merkle.rs)
  transcript/ L3 Fiat-Shamir transcript      (reference: src/fiatshamir.rs + nimue)
  fri/        L4 DEEP-FRI low degree test    (reference: src/fri.rs)
  air/        L5 AIR frontend                (reference: src/air.rs)
  stark/      L6 STARK orchestration         (reference: src/starks.rs)
  models/     L7 user AIR programs           (reference: tests/e2e_*.rs)
  ops/        TPU kernels (device field ops, NTT, SHA-256)
  parallel/   device mesh + sharded NTT/FRI (new; mandated by BASELINE.json)
  utils/      math helpers, RNG replication, errors (reference: src/util.rs)
"""

__version__ = "0.1.0"
