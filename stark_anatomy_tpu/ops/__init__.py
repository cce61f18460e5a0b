"""Device and host compute primitives: field arithmetic, NTT, hashing."""
