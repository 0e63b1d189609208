"""Pallas TPU kernels for the pYIN Viterbi decode.

The Viterbi recurrence is the only irreducibly sequential stage of the fused
analyze program (everything else is parallel VPU/MXU work).  As a
``jax.lax.scan`` it pays per-step XLA loop overhead and computes a dense
(n, n) max-plus step even though the pitch-transition matrix is a banded
triangular window (ref.pyin_ref.local_transition, half-width w~101 of 441
bins).  Here the decode runs as TWO Pallas grid programs — forward pass and
backtrace — with the time axis as the (sequential) grid dimension, so every
per-frame row read/write is a pipelined BlockSpec and the recurrence carry
lives in VMEM/SMEM scratch that persists across grid steps.

Mosaic-shaped design (each choice is forced by a lowering constraint):

  * The (R=256, Np) shifted-delta Hankel matrix S[row, j] = delta[j + w - row]
    is built with strided ``pltpu.roll`` — Mosaic rejects lane-unaligned
    vector slices, and a strided roll's per-row shift must stay under one
    vreg (128 lanes), so the 256 rows are produced as 4 chunks of 64 with a
    plain base roll each (large constant shifts ARE supported).
  * Dynamic row indexing into VMEM needs provably 8-aligned indices, so all
    per-frame I/O goes through grid BlockSpecs instead (index_map = row).
  * The dense reference semantics give OUT-of-band transitions a constant
    log(1e-30) floor (the scan path applies log(trans + eps)), so long
    pitch jumps are possible at a heavy penalty.  A per-step "global jump"
    escape — max_i(delta) + log(eps) — competes with the banded max per
    column; a jump bit plus the per-step global argmax restores the
    backpointer.
  * Backpointers are int8 *relative* offsets (o = w - argmax_row); the
    per-state choice/jump booleans are bit-packed 16-per-int32-word via an
    MXU matmul against a constant weight matrix (1D reshapes don't lower;
    array constants can't be captured, so the weights are an input), and
    all four bit groups plus the two global-argmax indices ride in one
    (T, 256) int32 metadata plane.
  * The backtrace grid walks rows in DESCENDING time order via its
    index_map; scalar picks from the loaded row are masked-iota reductions
    (dynamic_slice doesn't lower), and the walking state is SMEM scratch.

Semantics match core.pyin.viterbi_decode except argmax tie-breaking between
exactly-equal float scores (the strided roll can only produce descending
source offsets, so ties prefer the LARGER source bin where the dense scan
prefers the smaller; real-signal ties are measure-zero).  The scan path
remains the fallback for CPU tests and oversized inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = np.float32(-1e30)  # -inf breaks max-plus padding arithmetic
LOG_EPS = np.float32(np.log(1e-30))  # dense out-of-band floor, see core.pyin

CHUNK = 64          # strided-roll rows per chunk (max shift 63 < 128 lanes)
N_CHUNKS = 4        # R = 256 rows covers offsets w-255 .. w
BITS_PER_WORD = 16  # int32 words, high half unused: no sign-bit pitfalls
ROWS = 8            # rows per grid block (min f32/i32 sublane tile)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_banded_log_transition(trans_local: np.ndarray,
                                half_width: int) -> np.ndarray:
    """(R, Np) band in Hankel-row layout: band[row, j] = log(trans[i, j] +
    1e-30) for source i = j + (w - row); NEG_INF when i or j is not a real
    state.  R = N_CHUNKS*CHUNK rows must cover offsets [-w, w]."""
    n = trans_local.shape[0]
    Np = _round_up(n, 128)
    w = half_width
    R = N_CHUNKS * CHUNK
    if R < 2 * w + 1:
        raise ValueError(f"band half-width {w} needs more than {R} rows")
    log_t = np.log(trans_local.astype(np.float64) + 1e-30).astype(np.float32)
    band = np.full((R, Np), NEG_INF, np.float32)
    for row in range(R):
        o = w - row
        j = np.arange(n)
        i = j + o
        valid = (i >= 0) & (i < n)
        band[row, j[valid]] = log_t[i[valid], j[valid]]
    return band


def build_pack_weights(Np: int) -> np.ndarray:
    """(Np, Np//16) f32: W[i, g] = 2^(i%16) iff g == i//16 — bit packing as
    one MXU matmul (values <= 65535 are exact in f32)."""
    words = Np // BITS_PER_WORD
    W = np.zeros((Np, words), np.float32)
    for i in range(Np):
        W[i, i // BITS_PER_WORD] = float(1 << (i % BITS_PER_WORD))
    return W


def _fwd_kernel(obs_v_ref, obs_u_ref, band_ref, w_pack_ref, dinit_ref,
                bv_ref, bu_ref, meta_ref, dfinal_ref, delta_ref,
                *, T: int, n: int, w: int, log_stay: float,
                log_switch: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, Np = band_ref.shape
    Lr = _round_up(Np + 2 * w, 128)
    words = Np // BITS_PER_WORD
    b = pl.program_id(0)
    real = jax.lax.broadcasted_iota(jnp.int32, (Np,), 0) < n

    def pack_bits(mask):
        row = jnp.dot(mask.astype(jnp.float32)[None, :], w_pack_ref[:],
                      preferred_element_type=jnp.float32)
        return row.astype(jnp.int32)  # (1, words)

    def maxplus(delta):
        d2 = jnp.concatenate(
            [delta[None, :],
             jnp.full((1, Lr - Np), NEG_INF, jnp.float32)], axis=1)
        chunks = []
        for c in range(N_CHUNKS):
            s0 = (CHUNK * c - w) % Lr
            base = pltpu.roll(d2, s0, axis=1)
            qb = jnp.broadcast_to(base, (CHUNK, Lr))
            chunks.append(
                pltpu.roll(qb, 0, axis=1, stride=1, stride_axis=0))
        # S[row, j] = delta[(j + w - row) mod Lr]; wrap hits NEG_INF padding
        S = jnp.concatenate(chunks, axis=0)[:, :Np]
        scores = S + band_ref[:]
        m_band = jnp.max(scores, axis=0)
        row_best = jnp.argmax(scores, axis=0).astype(jnp.int32)
        d_real = jnp.where(real, delta, NEG_INF)
        g = jnp.max(d_real)
        g_idx = jnp.argmax(d_real).astype(jnp.int32)
        jump = g + LOG_EPS
        use_jump = jump > m_band
        rel = w - row_best  # |rel| <= w for live columns
        return jnp.where(use_jump, jump, m_band), rel, use_jump, g_idx

    @pl.when(b == 0)
    def _():
        delta_ref[:] = dinit_ref[:]

    # BlockSpec sublane blocks must be multiples of 8, and dynamic VMEM row
    # indices must be provably aligned — so rows are processed with a
    # statically unrolled loop over the 8 rows of this block.
    for r in range(ROWS):
        t = b * ROWS + r

        @pl.when(t == 0)
        def _(r=r):
            bv_ref[r, :] = jnp.zeros((Np,), jnp.int32)
            bu_ref[r, :] = jnp.zeros((Np,), jnp.int32)
            meta_ref[r, :] = jnp.zeros((256,), jnp.int32)

        @pl.when((t > 0) & (t < T))
        def _(r=r, t=t):
            dv = delta_ref[0, :]
            du = delta_ref[1, :]
            m_v, rel_v, jmp_v, gi_v = maxplus(dv)
            m_u, rel_u, jmp_u, gi_u = maxplus(du)
            lov = obs_v_ref[r, :]
            lou = obs_u_ref[r, 0]

            stay = m_v + log_stay
            switch = m_u + log_switch
            take_stay = stay >= switch
            dv_new = jnp.where(take_stay, stay, switch) + lov

            sw2 = m_v + log_switch
            st2 = m_u + log_stay
            take_sw = sw2 >= st2
            du_new = jnp.where(take_sw, sw2, st2) + lou

            bv_ref[r, :] = rel_v
            bu_ref[r, :] = rel_u
            gfill = 256 - 4 * words
            meta_ref[r, :] = jnp.concatenate([
                pack_bits(take_stay), pack_bits(take_sw),
                pack_bits(jmp_v), pack_bits(jmp_u),
                jnp.full((1, gfill // 2), gi_v, jnp.int32),
                jnp.full((1, gfill - gfill // 2), gi_u, jnp.int32),
            ], axis=1)[0]
            delta_ref[0, :] = dv_new
            delta_ref[1, :] = du_new

        @pl.when(t == T - 1)
        def _():
            dfinal_ref[:] = delta_ref[:]

        @pl.when(t >= T)
        def _(r=r):
            bv_ref[r, :] = jnp.zeros((Np,), jnp.int32)
            bu_ref[r, :] = jnp.zeros((Np,), jnp.int32)
            meta_ref[r, :] = jnp.zeros((256,), jnp.int32)


def _back_kernel(bv_ref, bu_ref, meta_ref, dfinal_ref,
                 states_ref, s_ref,
                 *, T: int, n: int, words: int, n_blocks: int):
    from jax.experimental import pallas as pl

    Np = bv_ref.shape[1]
    i = pl.program_id(0)
    base = (n_blocks - 1 - i) * ROWS  # descending block walk
    real = jax.lax.broadcasted_iota(jnp.int32, (Np,), 0) < n
    gi_v_lane = 4 * words
    gi_u_lane = 4 * words + (256 - 4 * words) // 2

    def at_idx(arr, k):
        ii = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
        return jnp.sum(jnp.where(ii == k, arr.astype(jnp.int32), 0))

    # Sequential semantics per visited row t (descending):
    #   t == T-1: s = argmax(final delta)
    #   states[t] = s; then s = psi[t][s] (prepares the t-1 row)
    for r in range(ROWS - 1, -1, -1):
        t = base + r

        @pl.when(t >= T)
        def _(r=r):
            states_ref[r, :] = jnp.zeros(states_ref.shape[1:], jnp.int32)

        @pl.when(t == T - 1)
        def _():
            dv = jnp.where(real, dfinal_ref[0, :], NEG_INF)
            du = jnp.where(real, dfinal_ref[1, :], NEG_INF)
            cat = jnp.concatenate([dv[None, :], du[None, :]], axis=1)[0]
            best = jnp.argmax(cat).astype(jnp.int32)
            s_ref[0] = jnp.where(best < Np, best, best - Np + n)

        @pl.when(t < T)
        def _(r=r, t=t):
            s = s_ref[0]
            states_ref[r, :] = jnp.broadcast_to(s, states_ref.shape[1:])
            row = (s >= n).astype(jnp.int32)
            idx = s - row * n
            word = idx // BITS_PER_WORD
            bit = idx % BITS_PER_WORD
            meta = meta_ref[r, :]

            def get_bit(group):
                wv = at_idx(meta, group * words + word)
                return ((wv >> bit) & 1) == 1

            # choice=True -> predecessor is the voiced chain; the jump bit
            # belongs to the source chain, so it's selected by `choice`.
            choice = jnp.where(row == 0, get_bit(0), get_bit(1))
            jump = jnp.where(choice, get_bit(2), get_bit(3))
            rel = jnp.where(choice, at_idx(bv_ref[r, :], idx),
                            at_idx(bu_ref[r, :], idx))
            g = jnp.where(choice, at_idx(meta, gi_v_lane),
                          at_idx(meta, gi_u_lane))
            prev_idx = jnp.where(jump, g, idx + rel)
            prev = prev_idx + jnp.where(choice, 0, n)

            @pl.when(t >= 1)
            def _():
                s_ref[0] = prev



@functools.partial(jax.jit,
                   static_argnames=("n", "half_width", "log_stay",
                                    "log_switch", "interpret"))
def viterbi_decode_pallas(log_obs_v: jnp.ndarray, log_obs_u: jnp.ndarray,
                          band: jnp.ndarray, n: int, half_width: int,
                          log_stay: float, log_switch: float,
                          interpret: bool = False) -> jnp.ndarray:
    """Banded Viterbi decode on TPU.  Returns states (T,) int32 in [0, 2n).

    log_obs_v: (T, n) log observation for voiced states.
    log_obs_u: (T,)   log observation for unvoiced states (uniform over n).
    band:      (R, Np) from build_banded_log_transition.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = log_obs_v.shape[0]
    R, Np = band.shape
    words = Np // BITS_PER_WORD
    T8 = _round_up(T, ROWS)
    n_blocks = T8 // ROWS
    obs_v = jnp.full((T8, Np), NEG_INF, jnp.float32).at[:T, :n].set(
        jnp.maximum(log_obs_v.astype(jnp.float32), NEG_INF))
    obs_u = jnp.full((T8, 1), NEG_INF, jnp.float32).at[:T, 0].set(
        jnp.maximum(log_obs_u.astype(jnp.float32), NEG_INF))
    w_pack = jnp.asarray(build_pack_weights(Np))

    init = jnp.full((2, Np), NEG_INF, jnp.float32)
    init = init.at[0, :n].set(np.float32(np.log(1.0 / (2 * n))) +
                              obs_v[0, :n])
    init = init.at[1, :n].set(np.float32(np.log(1.0 / (2 * n))) + obs_u[0, 0])

    def row_spec(shape):
        return pl.BlockSpec(shape, lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda b: (0, 0),
                            memory_space=pltpu.VMEM)

    fwd = functools.partial(_fwd_kernel, T=T, n=n, w=half_width,
                            log_stay=log_stay, log_switch=log_switch)
    bv, bu, meta, dfinal = pl.pallas_call(
        fwd,
        grid=(n_blocks,),
        in_specs=[
            row_spec((ROWS, Np)),                 # obs_v rows
            row_spec((ROWS, 1)),                  # obs_u rows
            const_spec((R, Np)),                  # band
            const_spec(w_pack.shape),             # pack weights
            const_spec((2, Np)),                  # init delta
        ],
        out_specs=(
            row_spec((ROWS, Np)),                 # rel offsets, v chain
            row_spec((ROWS, Np)),                 # rel offsets, u chain
            row_spec((ROWS, 256)),                # packed bits + gidx
            const_spec((2, Np)),                  # final delta
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T8, Np), jnp.int32),
            jax.ShapeDtypeStruct((T8, Np), jnp.int32),
            jax.ShapeDtypeStruct((T8, 256), jnp.int32),
            jax.ShapeDtypeStruct((2, Np), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, Np), jnp.float32)],
        interpret=interpret,
    )(obs_v, obs_u, band, w_pack, init)

    back = functools.partial(_back_kernel, T=T, n=n, words=words,
                             n_blocks=n_blocks)

    def rev_spec(shape):
        return pl.BlockSpec(shape, lambda i: (n_blocks - 1 - i, 0),
                            memory_space=pltpu.VMEM)

    states = pl.pallas_call(
        back,
        grid=(n_blocks,),
        in_specs=[
            rev_spec((ROWS, Np)),                 # bv block, descending
            rev_spec((ROWS, Np)),                 # bu block
            rev_spec((ROWS, 256)),                # meta block
            const_spec((2, Np)),                  # final delta
        ],
        out_specs=rev_spec((ROWS, 128)),
        out_shape=jax.ShapeDtypeStruct((T8, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(bv, bu, meta, dfinal)
    return states[:T, 0]


def viterbi_vmem_bytes(T: int, n: int, half_width: int) -> int:
    """Rough live-VMEM footprint so callers can gate kernel eligibility.
    Rows are streamed by the grid pipeline, so the budget is dominated by
    the resident band/weights/carry plus per-step Hankel temporaries."""
    Np = _round_up(n, 128)
    Lr = _round_up(Np + 2 * half_width, 128)
    R = N_CHUNKS * CHUNK
    return (R * Np * 4            # band
            + R * Lr * 4 * 2      # per-step Hankel temporaries (x2 chains)
            + Np * (Np // BITS_PER_WORD) * 4  # pack weights
            + 16 * Np * 4)        # carries + rows
