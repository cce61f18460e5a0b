"""Multi-device / multi-host parallelism: meshes, sharded NTT, sharded prover."""
