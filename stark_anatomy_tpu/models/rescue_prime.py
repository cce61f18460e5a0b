"""Rescue-Prime permutation over F_p: hash gadget + traced computation.

The reference contains no Rescue-Prime (SURVEY.md section 0); the north star
(BASELINE.md) requires proving a Rescue-Prime trace. This is our framework's
pinned instance (parameters are part of the proof system and must never
change):

- state width m = 2 (rate 1, capacity 1), N = 27 rounds;
- S-box x^alpha with alpha = 3 (gcd(3, p-1) = 1 since p-1 = 2^119*11*37),
  inverse S-box x^(1/3) with 1/3 taken mod p-1;
- MDS matrix from the Cauchy construction M[i][j] = 1/(x_i + y_j) with
  x = (1, 2), y = (3, 4) — Cauchy matrices are provably MDS;
- round constants: SHA-256 counter-mode expansion of the domain-separation
  tag "stark_anatomy_tpu/rescue-prime/v1", reduced mod p (bias < 2^-128).

A round r maps S -> S' via two half-rounds:
    u  = M . S^alpha + C[2r]          (elementwise power)
    S' = M . u^(1/alpha) + C[2r+1]
which gives the degree-alpha-in-both-directions AIR constraint
    M . S^alpha + C1(x)  ==  (M^{-1} . (S' - C2(x)))^alpha
used by the STARK layer (iop/stark.py); C1/C2 are the round-constant
columns interpolated over the trace domain.

Device evaluation (eval_transition_device) runs on (8, n) Montgomery limb
arrays (ops/field_jnp.py) — fully vectorized over the LDE domain. Host
evaluation (eval_transition_host) is exact scalar Python for the verifier.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.ops import field_jnp as fj
from stark_anatomy_tpu.ops.field import PRIME, finv

_CONSTANTS_TAG = b"stark_anatomy_tpu/rescue-prime/v1"


def _expand_constants(count: int) -> List[int]:
    out = []
    for i in range(count):
        digest = hashlib.sha256(_CONSTANTS_TAG + i.to_bytes(8, "big")).digest()
        out.append(int.from_bytes(digest, "big") % PRIME)
    return out


def _mat_inv_2x2(m: List[List[int]]) -> List[List[int]]:
    det = (m[0][0] * m[1][1] - m[0][1] * m[1][0]) % PRIME
    d = finv(det)
    return [
        [m[1][1] * d % PRIME, -m[0][1] * d % PRIME],
        [-m[1][0] * d % PRIME, m[0][0] * d % PRIME],
    ]


@dataclass(frozen=True)
class RescuePrime:
    """The pinned Rescue-Prime instance (m=2, N=27, alpha=3)."""

    m: int = 2
    capacity: int = 1
    N: int = 27
    alpha: int = 3

    @property
    def rate(self) -> int:
        return self.m - self.capacity

    @property
    def alpha_inv(self) -> int:
        return pow(self.alpha, -1, PRIME - 1)

    @property
    def mds(self) -> List[List[int]]:
        # Cauchy: M[i][j] = 1/(x_i + y_j), x=(1,2), y=(3,4).
        return [
            [finv((xi + yj) % PRIME) for yj in (3, 4)] for xi in (1, 2)
        ]

    @property
    def mds_inv(self) -> List[List[int]]:
        return _mat_inv_2x2(self.mds)

    @property
    def round_constants(self) -> List[int]:
        """2*m*N constants; round r uses [2mr : 2mr+m] then [2mr+m : 2mr+2m]."""
        return _expand_constants(2 * self.m * self.N)

    # -- host permutation (exact ints, trace generation / oracle) ----------

    def round_function(self, state: Sequence[int], r: int) -> List[int]:
        c = self.round_constants
        m, a = self.m, self.alpha
        mid = [
            (sum(self.mds[i][j] * pow(state[j], a, PRIME) for j in range(m))
             + c[2 * m * r + i]) % PRIME
            for i in range(m)
        ]
        ainv = self.alpha_inv
        return [
            (sum(self.mds[i][j] * pow(mid[j], ainv, PRIME) for j in range(m))
             + c[2 * m * r + m + i]) % PRIME
            for i in range(m)
        ]

    def permutation(self, state: Sequence[int]) -> List[int]:
        s = list(state)
        for r in range(self.N):
            s = self.round_function(s, r)
        return s

    def hash(self, input_element: int) -> int:
        """Sponge with rate 1: absorb one element, squeeze one element."""
        state = [input_element % PRIME] + [0] * (self.m - 1)
        return self.permutation(state)[0]

    def trace(self, input_element: int, chain_length: int = 1) -> np.ndarray:
        """Execution trace of `chain_length` chained permutations.

        Row t is the state after t rounds; rounds cycle through the N round
        functions (row t applies round t mod N), so a chain of K
        permutations is K*N uniform steps. Returns (K*N + 1, m) object
        array of ints. Row 0 = [input, 0, ...]; output = last row's first
        element (== iterating `permutation` K times).

        Generation runs in the native C++ library when available (the
        chain is inherently sequential — host work; tests pin native ==
        Python row-for-row) and falls back to exact Python here.
        """
        from stark_anatomy_tpu import native

        if native.AVAILABLE and self.m == 2:
            return native.rescue_chain_trace(self, input_element, chain_length)
        return self._trace_py(input_element, chain_length)

    def trace_bytes(self, input_element: int, chain_length: int = 1) -> np.ndarray:
        """Trace as (rows, m, 16) uint8 canonical encodings (bulk path)."""
        from stark_anatomy_tpu import native

        return native.rescue_chain_trace_bytes(self, input_element, chain_length)

    def _trace_py(self, input_element: int, chain_length: int = 1) -> np.ndarray:
        state = [input_element % PRIME] + [0] * (self.m - 1)
        rows = [list(state)]
        for t in range(chain_length * self.N):
            state = self.round_function(state, t % self.N)
            rows.append(list(state))
        return np.array(rows, dtype=object)

    def chain_output(self, input_element: int, chain_length: int = 1) -> int:
        state = [input_element % PRIME] + [0] * (self.m - 1)
        for _ in range(chain_length):
            state = self.permutation(state)
        return state[0]


@dataclass
class RescuePrimeAir:
    """AIR for a length-K Rescue-Prime permutation chain.

    cycle_count T = K*N + 1 rows; transition t -> t+1 applies round
    t mod N. num_constraints = m, each of algebraic degree alpha = 3 in the
    register variables. Round constants enter as interpolated trace-domain
    columns (periodic with period N over the chain, zero on padding rows —
    the STARK's transition zerofier excludes those rows anyway).
    """

    rp: RescuePrime
    chain_length: int = 1
    _cache: dict = field(default_factory=dict, repr=False)

    @property
    def num_registers(self) -> int:
        return self.rp.m

    @property
    def cycle_count(self) -> int:
        return self.chain_length * self.rp.N + 1

    @property
    def constraint_degree(self) -> int:
        return self.rp.alpha

    @property
    def num_constraints(self) -> int:
        return self.rp.m

    def constant_columns(self, num_rows: int) -> List[List[int]]:
        """2m columns of per-row round constants, zero-padded to num_rows.

        Column layout: [C1_0 .. C1_{m-1}, C2_0 .. C2_{m-1}]; row t holds the
        constants applied by transition t (round t mod N) for t < T-1.
        """
        m, c = self.rp.m, self.rp.round_constants
        cols = [[0] * num_rows for _ in range(2 * m)]
        for t in range(self.cycle_count - 1):
            r = t % self.rp.N
            for i in range(m):
                cols[i][t] = c[2 * m * r + i]
                cols[m + i][t] = c[2 * m * r + m + i]
        return cols

    def constant_columns_bytes(self, num_rows: int) -> List[np.ndarray]:
        """constant_columns as (num_rows, 16) uint8 canonical encodings.

        The columns are periodic with period N over the chain, so they are
        built by tiling N pre-encoded rows — no per-row Python-int work
        (matters at 2^20 rows; values identical to constant_columns).
        """
        m, n_r = self.rp.m, self.rp.N
        c = self.rp.round_constants
        t_len = self.cycle_count
        cols = []
        for k in range(2 * m):
            if k < m:
                period = [c[2 * m * r + k] for r in range(n_r)]
            else:
                period = [c[2 * m * r + m + (k - m)] for r in range(n_r)]
            enc = np.stack(
                [np.frombuffer(v.to_bytes(16, "little"), np.uint8) for v in period]
            )
            reps = -(-(t_len - 1) // n_r)
            out = np.zeros((num_rows, 16), dtype=np.uint8)
            out[: t_len - 1] = np.tile(enc, (reps, 1))[: t_len - 1]
            cols.append(out)
        return cols

    def boundary_constraints(self, output_element: int) -> List[tuple]:
        """(cycle, register, value) triples: capacity starts 0, output pinned."""
        out = [(0, j, 0) for j in range(self.rp.rate, self.rp.m)]
        out.append((self.cycle_count - 1, 0, output_element % PRIME))
        return out

    # -- constraint evaluation --------------------------------------------

    def eval_transition_device(
        self,
        cur: List[jnp.ndarray],
        nxt: List[jnp.ndarray],
        constants: List[jnp.ndarray],
    ) -> List[jnp.ndarray]:
        """Batched constraints: M.cur^a + C1 - (M^{-1}(nxt - C2))^a.

        cur/nxt: m arrays (8, n) Montgomery form (trace row and next row
        evaluated across the domain); constants: 2m arrays (8, n) Montgomery
        form (the constant_columns LDE'd by the STARK layer). Returns m
        constraint codewords, Montgomery form.
        """
        from stark_anatomy_tpu.ops import field_pallas as fp

        m = self.rp.m
        mds = self.rp.mds
        mds_inv = self.rp.mds_inv
        n = cur[0].shape[-1]

        def cmul(value: int, arr):
            from stark_anatomy_tpu.ops.limbs import R_MOD_P, int_to_limbs

            c = jnp.asarray(
                int_to_limbs(value * R_MOD_P % PRIME), dtype=jnp.uint32
            ).reshape(8, 1)
            return fp.mont_mul(jnp.broadcast_to(c, (8, n)), arr)

        def cube(arr):
            return fp.mont_mul(fp.mont_mul(arr, arr), arr)

        cur_cubed = [cube(c) for c in cur]
        lhs = []
        for i in range(m):
            acc = cmul(mds[i][0], cur_cubed[0])
            for j in range(1, m):
                acc = fp.add(acc, cmul(mds[i][j], cur_cubed[j]))
            lhs.append(fp.add(acc, constants[i]))
        del cur_cubed
        shifted = [fp.sub(nxt[j], constants[m + j]) for j in range(m)]
        rhs_lin = []
        for i in range(m):
            acc = cmul(mds_inv[i][0], shifted[0])
            for j in range(1, m):
                acc = fp.add(acc, cmul(mds_inv[i][j], shifted[j]))
            rhs_lin.append(acc)
        del shifted
        return [fp.sub(lhs[i], cube(rhs_lin[i])) for i in range(m)]

    def eval_transition_host(
        self,
        cur: Sequence[int],
        nxt: Sequence[int],
        constants: Sequence[int],
    ) -> List[int]:
        """Exact scalar constraint evaluation (verifier side)."""
        m, a = self.rp.m, self.rp.alpha
        mds, mds_inv = self.rp.mds, self.rp.mds_inv
        out = []
        for i in range(m):
            lhs = (
                sum(mds[i][j] * pow(cur[j], a, PRIME) for j in range(m))
                + constants[i]
            ) % PRIME
            rhs_lin = (
                sum(mds_inv[i][j] * (nxt[j] - constants[m + j]) for j in range(m))
            ) % PRIME
            out.append((lhs - pow(rhs_lin, a, PRIME)) % PRIME)
        return out
