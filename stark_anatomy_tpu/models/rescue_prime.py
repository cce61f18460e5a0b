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

Trace layout (round 2 redesign, the production-STARK alignment trick):
each permutation occupies ROWS_PER_PERM = 32 trace rows — transitions
t with (t mod 32) < 27 apply round (t mod 32); the remaining 5
transitions per block copy the state unchanged. Because 32 is a power of
two DIVIDING every omicron domain, all AIR constant columns (round
constants + the round/copy selector) are exactly 32-periodic over the
whole domain: their interpolants are Q(x^(O/32)) for degree-<32 Q, so
both the verifier (host Horner at x^(O/32), O(1) work per query) and the
prover (a period-32*blowup tiled codeword) evaluate them succinctly.
With the 27-periodic layout of round 1 this was impossible — 27 divides
no power-of-two domain, so constants needed a full O(F log F) LDE and
the verifier was O(F). The combined transition constraint
    sel(x) * round_constraint + (1 - sel(x)) * (next - cur)
has algebraic degree alpha + 1 = 4.

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
    """The pinned Rescue-Prime instance (m=2, N=27, alpha=3).

    rows_per_perm: trace rows per permutation — a power of two >= N so the
    AIR's constant columns are periodic with a power-of-two period (see
    module docstring). The permutation itself is independent of it.
    """

    m: int = 2
    capacity: int = 1
    N: int = 27
    alpha: int = 3
    rows_per_perm: int = 32

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

        Each permutation occupies rows_per_perm (= 32) rows: transition t
        applies round (t mod 32) when that residue is < N and copies the
        state otherwise (power-of-two schedule, see module docstring).
        Returns (K*32 + 1, m) object array of ints. Row 0 = [input, 0, ...];
        output = last row's first element (== iterating `permutation` K
        times).

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
        for t in range(chain_length * self.rows_per_perm):
            r = t % self.rows_per_perm
            if r < self.N:
                state = self.round_function(state, r)
            rows.append(list(state))
        return np.array(rows, dtype=object)

    def chain_output(self, input_element: int, chain_length: int = 1) -> int:
        """First state element after chain_length permutations.

        Long chains run the native output-only chain (no trace-row
        materialization — the Python loop costs ~200us per round at
        128-bit exponents, minutes at 2^20 rows, and the previous
        read-the-native-trace path allocated the full row buffer a second
        time); short chains keep the pure-Python path, which also serves
        as the cross-check oracle in tests/test_native.py.
        """
        from stark_anatomy_tpu import native

        if native.AVAILABLE and self.m == 2 and chain_length > 64:
            out = native.rescue_chain_output(self, input_element, chain_length)
            if out is not None:
                return out[0]
        state = [input_element % PRIME] + [0] * (self.m - 1)
        for _ in range(chain_length):
            state = self.permutation(state)
        return state[0]


@dataclass
class RescuePrimeAir:
    """AIR for a length-K Rescue-Prime permutation chain.

    cycle_count T = K*32 + 1 rows; transition t -> t+1 applies round
    (t mod 32) when that residue is < N, and copies the state otherwise
    (power-of-two schedule, module docstring). num_constraints = m, each of
    algebraic degree alpha + 1 = 4 in the register variables (the round/copy
    selector multiplies the cubic round constraint). All constant columns —
    2m round-constant columns and the selector — are EXACTLY periodic with
    period 32 over any omicron domain, so both sides evaluate them
    succinctly (periodic_columns below; consumed by iop/stark.py).
    """

    rp: RescuePrime
    chain_length: int = 1
    _cache: dict = field(default_factory=dict, repr=False)

    @property
    def num_registers(self) -> int:
        return self.rp.m

    @property
    def cycle_count(self) -> int:
        return self.chain_length * self.rp.rows_per_perm + 1

    @property
    def constraint_degree(self) -> int:
        # sel(x) (degree < O from a periodic column) times the cubic round
        # constraint: one extra trace-degree factor.
        return self.rp.alpha + 1

    @property
    def num_constraints(self) -> int:
        return self.rp.m

    def periodic_columns(self):
        """(period, columns): each column is `period` values, row t of the
        omicron domain holding column[t mod period].

        Layout: [C1_0 .. C1_{m-1}, C2_0 .. C2_{m-1}, sel]; slot c < N holds
        round c's constants with sel = 1, slots N..period-1 are copy rows
        (constants 0, sel = 0). The period (rows_per_perm = 32) divides
        every power-of-two omicron domain, which is what makes these
        columns succinct for the verifier (iop/stark.py periodic machinery).
        """
        m, n_r, p = self.rp.m, self.rp.N, self.rp.rows_per_perm
        c = self.rp.round_constants
        cols = [[0] * p for _ in range(2 * m + 1)]
        for r in range(p):
            if r < n_r:
                for i in range(m):
                    cols[i][r] = c[2 * m * r + i]
                    cols[m + i][r] = c[2 * m * r + m + i]
                cols[2 * m][r] = 1
        return p, cols

    def constant_columns(self, num_rows: int) -> List[List[int]]:
        """Per-row expansion of periodic_columns (tests/reference path)."""
        period, cols = self.periodic_columns()
        return [[col[t % period] for t in range(num_rows)] for col in cols]

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
        """Batched constraints, selector-combined round/copy form:

            sel * (M.cur^a + C1 - (M^{-1}(nxt - C2))^a) + (1-sel) * (nxt - cur)

        cur/nxt: m arrays (8, n) Montgomery form (trace row and next row
        evaluated across the domain); constants: 2m+1 arrays (8, n)
        Montgomery form (the periodic_columns evaluated on the domain by
        the STARK layer; last entry is the selector). Returns m constraint
        codewords, Montgomery form.
        """
        from stark_anatomy_tpu.ops import field_pallas as fp
        from stark_anatomy_tpu.ops.limbs import R_MOD_P, int_to_limbs

        m = self.rp.m
        mds = self.rp.mds
        mds_inv = self.rp.mds_inv
        n = cur[0].shape[-1]
        sel = constants[2 * m]

        def cmul(value: int, arr):
            c = jnp.asarray(
                int_to_limbs(value * R_MOD_P % PRIME), dtype=jnp.uint32
            ).reshape(8, 1)
            return fp.mont_mul(jnp.broadcast_to(c, (8, n)), arr)

        def cube(arr):
            return fp.mont_mul(fp.mont_mul(arr, arr), arr)

        one = jnp.broadcast_to(
            jnp.asarray(int_to_limbs(R_MOD_P % PRIME), dtype=jnp.uint32).reshape(8, 1),
            (8, n),
        )
        not_sel = fp.sub(one, sel)
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
        out = []
        for i in range(m):
            round_part = fp.mont_mul(sel, fp.sub(lhs[i], cube(rhs_lin[i])))
            copy_part = fp.mont_mul(not_sel, fp.sub(nxt[i], cur[i]))
            out.append(fp.add(round_part, copy_part))
        return out

    def eval_transition_host(
        self,
        cur: Sequence[int],
        nxt: Sequence[int],
        constants: Sequence[int],
    ) -> List[int]:
        """Exact scalar constraint evaluation (verifier side)."""
        m, a = self.rp.m, self.rp.alpha
        mds, mds_inv = self.rp.mds, self.rp.mds_inv
        sel = constants[2 * m] % PRIME
        out = []
        for i in range(m):
            lhs = (
                sum(mds[i][j] * pow(cur[j], a, PRIME) for j in range(m))
                + constants[i]
            ) % PRIME
            rhs_lin = (
                sum(mds_inv[i][j] * (nxt[j] - constants[m + j]) for j in range(m))
            ) % PRIME
            round_part = (lhs - pow(rhs_lin, a, PRIME)) % PRIME
            copy_part = (nxt[i] - cur[i]) % PRIME
            out.append((sel * round_part + (1 - sel) * copy_part) % PRIME)
        return out
