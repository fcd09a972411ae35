"""zksnap_tpu — a TPU-native (JAX/XLA/Pallas) zkSNARK proving framework.

A ground-up re-design of the capability surface of
aerius-labs/zksnap-circuits-halo2 (a Halo2/PLONKish private-voting stack,
see /root/reference) for TPU hardware:

- ``fields``   — BN254 / secp256k1 field arithmetic as batched limb tensors
                 (reference: halo2curves).
- ``curves``   — short-Weierstrass group ops, batched Jacobian kernels
                 (reference: halo2curves G1/secp256k1).
- ``poly``     — NTT/iNTT evaluation domains, single-chip and mesh-sharded
                 (reference: halo2_proofs FFT domains).
- ``msm``      — Pippenger multi-scalar multiplication via sort +
                 segmented-scan (reference: halo2_proofs best_multiexp).
- ``hash``     — Poseidon (pse-poseidon compatible) native/batched, SHA-256.
- ``natives``  — host-side protocol mirror: Merkle/IMT trees, Paillier,
                 PLUME, input generators (reference: voter_tests, aggregator/utils.rs).
- ``trace``    — the circuit-builder runtime (reference: halo2-base
                 BaseCircuitBuilder/Context/FlexGate/RangeChip).
- ``gadgets``  — chip layer: Poseidon hasher, big-uint, Paillier, Merkle,
                 indexed-Merkle, ECC/CRT (reference: halo2-ecc, biguint-halo2,
                 paillier-chip, plume-halo2, indexed-merkle-tree-halo2).
- ``circuits`` — application circuits: voter, state_transition, recursion
                 (reference: voter/src/lib.rs, aggregator/src).
- ``prover``   — PLONK proving pipeline: KZG params, commitments, lookup +
                 permutation arguments, quotient, multiopen, transcripts
                 (reference: halo2_proofs create_proof / snark-verifier).
- ``parallel`` — device-mesh sharding of the hot kernels (new; the reference
                 is single-process rayon).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the bignum kernels are compile-heavy;
# caching across processes turns 10-60s first-compiles into <1s reloads.
if _os.environ.get("ZKSNAP_TPU_COMPILE_CACHE", "1") == "1":
    import jax as _jax

    _cache_dir = _os.environ.get(
        "ZKSNAP_TPU_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
    )
    _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
