"""NumPy-PCG64 emulation in JAX, for bit-exact oracle rollouts.

The reference consumes randomness through the NumPy bit generator: the C
kernels call ``next_double`` on a ``bitgen_t`` captured from
``Generator.bit_generator.capsule`` (reference ``safelife/speedups_src/
random.c:20-43``), drawing once per spawn-eligible cell in raster order
(``advance_board.c:115``). To reproduce reference trajectories bit-for-bit on
TPU we emulate PCG64 (the ``numpy.random.default_rng`` generator) inside jit.

JAX without x64 has no 64/128-bit integers, so the 128-bit LCG state is kept
as eight 16-bit limbs stored in uint32 lanes (little-endian). All arithmetic
is exact; outputs are validated limb-for-limb against NumPy in the test suite.

PCG64 (XSL-RR 128/64) reference semantics:

* state update: ``s = s * PCG_MULT + inc  (mod 2**128)`` — step happens
  *before* output.
* output: ``rotr64(high64(s) ^ low64(s), s >> 122)``.
* next_double: ``(next_uint64 >> 11) * 2**-53``.
"""

from fractions import Fraction
import math

import jax
import jax.numpy as jnp
import numpy as np

PCG_MULT = 0x2360ED051FC65DA44385DF649FCCF645

N_LIMBS = 8  # 8 x 16-bit limbs = 128 bits
_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


def int_to_limbs(value):
    """Python int (< 2**128) → uint32[8] of 16-bit little-endian limbs."""
    return jnp.array(
        [(value >> (16 * i)) & 0xFFFF for i in range(N_LIMBS)], dtype=_U32
    )


def limbs_to_int(limbs):
    """uint32[8] limbs → Python int."""
    limbs = np.asarray(limbs, dtype=np.uint64)
    return int(sum(int(v) << (16 * i) for i, v in enumerate(limbs)))


MULT_LIMBS_NP = np.array(
    [(PCG_MULT >> (16 * i)) & 0xFFFF for i in range(N_LIMBS)], dtype=np.uint32
)


def state_from_numpy(rng):
    """Extract (state, inc) limb arrays from a ``numpy.random.Generator``.

    The generator must be PCG64 (the ``default_rng`` bit generator).
    """
    st = rng.bit_generator.state
    if st["bit_generator"] != "PCG64":
        raise ValueError("oracle mode requires a PCG64 bit generator, got %s"
                         % st["bit_generator"])
    return int_to_limbs(st["state"]["state"]), int_to_limbs(st["state"]["inc"])


def state_to_numpy(rng, state_limbs):
    """Write an emulated state back into a ``numpy.random.Generator``."""
    st = rng.bit_generator.state
    st["state"]["state"] = limbs_to_int(state_limbs)
    # Any buffered uint32 halves in numpy must be discarded: the C path only
    # ever consumed whole uint64s, so the buffer is empty in reference use.
    st["has_uint32"] = 0
    st["uinteger"] = 0
    rng.bit_generator.state = st


def _mul128(a, b_limbs_const):
    """(a * b) mod 2**128 over 16-bit limbs. ``b_limbs_const`` is a host
    numpy array (the multiplier is a compile-time constant)."""
    cols = [jnp.zeros((), _U32) for _ in range(N_LIMBS + 1)]
    for i in range(N_LIMBS):
        ai = a[i]
        for j in range(N_LIMBS - i):
            p = ai * np.uint32(b_limbs_const[j])  # < 2**32, exact in uint32
            cols[i + j] = cols[i + j] + (p & _MASK16)
            if i + j + 1 < N_LIMBS:
                cols[i + j + 1] = cols[i + j + 1] + (p >> 16)
    # Carry propagation. Column sums are bounded by 8 * 0xFFFF * 2 plus
    # carries, far below 2**32, so uint32 accumulation is exact.
    out = []
    carry = jnp.zeros((), _U32)
    for k in range(N_LIMBS):
        v = cols[k] + carry
        out.append(v & _MASK16)
        carry = v >> 16
    return jnp.stack(out)


def _add128(a, b):
    """(a + b) mod 2**128 over 16-bit limbs."""
    out = []
    carry = jnp.zeros((), _U32)
    for k in range(N_LIMBS):
        v = a[k] + b[k] + carry
        out.append(v & _MASK16)
        carry = v >> 16
    return jnp.stack(out)


def pcg_step(state, inc):
    """One LCG step: state * MULT + inc (mod 2**128)."""
    return _add128(_mul128(state, MULT_LIMBS_NP), inc)


def _limbs_to_u32x2(l0, l1, l2, l3):
    """Four 16-bit limbs → (lo32, hi32) uint32 pair."""
    return l0 | (l1 << 16), l2 | (l3 << 16)


def _shl32_safe(v, k):
    """v << k for k in [0, 32], returning 0 at k == 32."""
    return jnp.where(k >= 32, jnp.zeros((), _U32), v << (k & 31))


def _shr32_safe(v, k):
    return jnp.where(k >= 32, jnp.zeros((), _U32), v >> (k & 31))


def _shr64(hi, lo, s):
    """Logical right shift of a 64-bit (hi, lo) pair by s in [0, 63]."""
    lo_small = (lo >> (s & 31)) | _shl32_safe(hi, 32 - s)
    hi_small = hi >> (s & 31)
    lo_big = _shr32_safe(hi, s - 32)
    big = s >= 32
    return jnp.where(big, jnp.zeros((), _U32), hi_small), \
        jnp.where(big, lo_big, lo_small)


def _shl64(hi, lo, s):
    """Logical left shift of a 64-bit (hi, lo) pair by s in [0, 63]."""
    hi_small = (hi << (s & 31)) | _shr32_safe(lo, 32 - s)
    lo_small = lo << (s & 31)
    hi_big = _shl32_safe(lo, s - 32)
    big = s >= 32
    return jnp.where(big, hi_big, hi_small), \
        jnp.where(big, jnp.zeros((), _U32), lo_small)


def _rotr64(hi, lo, r):
    """Rotate a 64-bit (hi, lo) pair right by r in [0, 63]."""
    rhi, rlo = _shr64(hi, lo, r)
    lhi, llo = _shl64(hi, lo, (64 - r) & 63)
    return rhi | lhi, rlo | llo


def pcg_output(state):
    """XSL-RR output of the (already stepped) state: (hi32, lo32) uint32."""
    xlo = state[0] ^ state[4]
    xl1 = state[1] ^ state[5]
    xl2 = state[2] ^ state[6]
    xl3 = state[3] ^ state[7]
    lo32, hi32 = _limbs_to_u32x2(xlo, xl1, xl2, xl3)
    rot = state[7] >> 10  # top 6 bits of the 128-bit state
    return _rotr64(hi32, lo32, rot)


def next_uint64(state, inc):
    """Step the generator and return (new_state, (hi32, lo32))."""
    state = pcg_step(state, inc)
    return state, pcg_output(state)


def next_double53(state, inc):
    """Step and return (new_state, (hi21, lo32)) of the 53-bit mantissa
    ``next_uint64 >> 11`` (the numerator of next_double = u53 * 2**-53)."""
    state, (hi, lo) = next_uint64(state, inc)
    dhi, dlo = _shr64(hi, lo, jnp.uint32(11))
    return state, (dhi, dlo)


def double53_lt(u_hi, u_lo, k_hi, k_lo):
    """Exact comparison u53 < K for 53-bit integers split into uint32 pairs."""
    return (u_hi < k_hi) | ((u_hi == k_hi) & (u_lo < k_lo))


def threshold_53(spawn_prob):
    """Host-side: smallest integer K with (u53 < K) ⟺ (u53 * 2**-53 < T),
    where T = float64(float32(spawn_prob)) replicates the C float narrowing
    of the threshold (advance_board.c:115). Returns (k_hi, k_lo) uint32."""
    t = float(np.float32(spawn_prob))
    k = math.ceil(Fraction(t) * (1 << 53))
    k = max(0, min(k, 1 << 53))
    return np.uint32(k >> 32), np.uint32(k & 0xFFFFFFFF)


def raster_spawn_draws(eligible, state, inc, k_hi, k_lo):
    """Draw spawn coin flips in raster order for eligible cells.

    Scans the flattened board; each eligible cell consumes exactly one
    ``next_double`` from the emulated stream, matching the reference's
    sequential raster loop (advance_board.c:94-124).

    Parameters
    ----------
    eligible : bool[H, W]
    state, inc : uint32[8] PCG64 limb state
    k_hi, k_lo : uint32 threshold from :func:`threshold_53`

    Returns
    -------
    spawns : bool[H, W]
    new_state : uint32[8]
    """
    flat = eligible.reshape(-1)

    def body(st, e):
        st2, (dhi, dlo) = next_double53(st, inc)
        lt = double53_lt(dhi, dlo, k_hi, k_lo)
        st_out = jnp.where(e, st2, st)
        return st_out, e & lt

    new_state, spawns = jax.lax.scan(body, state, flat)
    return spawns.reshape(eligible.shape), new_state
