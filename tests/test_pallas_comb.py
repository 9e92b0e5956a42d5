"""VMEM-resident comb kernel vs the XLA chunked solve (interpret mode on
CPU; the TPU run matched bit-exactly, see PERF.md).

The kernel takes RAW source signals and extracts each comb's lag-shifted
window in-kernel (VMEM-carried chunks + lane rotation), so the tests
feed it the unshifted (S, N) signals directly."""

import numpy as np
import jax.numpy as jnp

from aefs_tpu.ops.ringbuf import comb_bank_file
from aefs_tpu.ops.pallas.comb import comb_bank_file_pallas


def _run_pallas(x, g, h, lags, c, side_of=None):
    n = x.shape[1]
    m = -(-n // c)
    n_pad = m * c
    y_p, d_p = comb_bank_file_pallas(
        jnp.pad(x, ((0, 0), (0, n_pad - n))), g, h, lags, c,
        side_of=side_of, interpret=True,
    )
    b = len(lags)
    y_p = jnp.moveaxis(y_p, 0, 1).reshape(b, n_pad)[:, :n]
    d_p = jnp.moveaxis(d_p, 0, 1).reshape(b, n_pad)[:, :n]
    return y_p, d_p


def test_pallas_comb_matches_xla_interpret():
    rng = np.random.default_rng(0)
    lags = (1411, 1782, 1973, 2098)
    n = 30000
    x = jnp.asarray((0.3 * rng.standard_normal((4, n))).astype(np.float32))
    g = jnp.asarray([0.9, 0.85, 0.8, 0.88], jnp.float32)
    h = jnp.float32(0.3)

    y_xla, d_xla = comb_bank_file(x, lags, g, h, use_pallas=False)
    c = (min(lags) // 128) * 128
    y_p, d_p = _run_pallas(x, g, h, lags, c)

    assert float(jnp.max(jnp.abs(y_p - y_xla))) < 1e-5
    assert float(jnp.max(jnp.abs(d_p - d_xla))) < 1e-5


def test_pallas_comb_lag_equal_chunk_edge():
    """L == C exactly (off == C) must read purely from the newer chunk."""
    lags = (256, 300, 420, 511)
    c = 256
    n = 2048
    rng = np.random.default_rng(1)
    x = jnp.asarray((0.3 * rng.standard_normal((4, n))).astype(np.float32))
    g = jnp.asarray([0.5, 0.6, 0.7, 0.8], jnp.float32)
    h = jnp.float32(0.2)
    y_xla, _ = comb_bank_file(x, lags, g, h, chunk=c, use_pallas=False)
    y_p, _ = _run_pallas(x, g, h, lags, c)
    assert float(jnp.max(jnp.abs(y_p - y_xla))) < 1e-5


def test_pallas_comb_shared_sides():
    """The reverb's layout: 8 combs over 2 source sides (side_of map)."""
    from aefs_tpu.ops.ringbuf import comb_bank_file_chunks

    rng = np.random.default_rng(2)
    lags = (1425, 1780, 1972, 2097, 1411, 1766, 1958, 2083)
    side_of = (0, 0, 0, 0, 1, 1, 1, 1)
    n = 20000
    x2 = jnp.asarray((0.3 * rng.standard_normal((2, n))).astype(np.float32))
    g = jnp.asarray(np.linspace(0.5, 0.9, 8), jnp.float32)
    h = jnp.float32(0.25)

    # Reference: identity map over explicitly repeated rows.
    x8 = jnp.repeat(x2, 4, axis=0)
    y_ref, d_ref = comb_bank_file(x8, lags, g, h, use_pallas=False)

    y_mbc, d_mbc, c = comb_bank_file_chunks(
        x2, lags, g, h, use_pallas="interpret", side_of=side_of
    )
    n_pad = y_mbc.shape[0] * c
    y_p = jnp.moveaxis(y_mbc, 0, 1).reshape(8, n_pad)[:, :n]
    d_p = jnp.moveaxis(d_mbc, 0, 1).reshape(8, n_pad)[:, :n]
    assert float(jnp.max(jnp.abs(y_p - y_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(d_p - d_ref))) < 1e-5

def test_pallas_comb_sums_matches_fallback():
    """Fused kernel (per-side sums + 3-chunk damped tail, in-kernel
    Hillis damping scan) vs the XLA fallback reduction."""
    from aefs_tpu.ops.ringbuf import comb_bank_file_sums

    rng = np.random.default_rng(3)
    lags = (1425, 1780, 1972, 2097, 1411, 1766, 1958, 2083)
    side_of = (0, 0, 0, 0, 1, 1, 1, 1)
    n = 20000
    x2 = jnp.asarray((0.3 * rng.standard_normal((2, n))).astype(np.float32))
    g = jnp.asarray(np.linspace(0.5, 0.9, 8), jnp.float32)
    h = jnp.float32(0.25)

    y_ref, d_ref, c_ref = comb_bank_file_sums(
        x2, lags, g, h, side_of, 2, use_pallas=False
    )
    y_p, d_p, c = comb_bank_file_sums(
        x2, lags, g, h, side_of, 2, use_pallas="interpret"
    )
    assert c == c_ref and y_p.shape == y_ref.shape and d_p.shape == (3, 8, c)
    assert float(jnp.max(jnp.abs(y_p - y_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(d_p - d_ref))) < 1e-4


def test_pallas_comb_sums_short_signal():
    """Signals shorter than three chunks: the leading damped-tail rows
    stay zero (the pre-signal state) and sums still match."""
    from aefs_tpu.ops.ringbuf import comb_bank_file_sums

    rng = np.random.default_rng(4)
    lags = (1425, 1780, 1972, 2097)
    side_of = (0, 0, 1, 1)
    for n in (900, 1500, 2900):  # m = 1, 2, 3 chunks at c = 1408
        x2 = jnp.asarray((0.3 * rng.standard_normal((2, n))).astype(np.float32))
        g = jnp.asarray([0.5, 0.6, 0.7, 0.8], jnp.float32)
        h = jnp.float32(0.3)
        y_ref, d_ref, _ = comb_bank_file_sums(
            x2, lags, g, h, side_of, 2, use_pallas=False
        )
        y_p, d_p, _ = comb_bank_file_sums(
            x2, lags, g, h, side_of, 2, use_pallas="interpret"
        )
        assert float(jnp.max(jnp.abs(y_p - y_ref))) < 1e-5
        assert float(jnp.max(jnp.abs(d_p - d_ref))) < 1e-4


def test_pallas_comb_sums_fir_damping():
    """Static-h truncated-FIR damping (h_static baked, h^J < 2^-40) vs the
    XLA fallback's exact recursion: numerically identical within f32
    rounding at small h, including multi-grid-step reach-back and the
    damped tail."""
    from aefs_tpu.ops.ringbuf import comb_bank_file_sums
    from aefs_tpu.ops.pallas.comb import fir_damp_weights

    rng = np.random.default_rng(5)
    lags = (1425, 1780, 1972, 2097, 1411, 1766, 1958, 2083)
    side_of = (0, 0, 0, 0, 1, 1, 1, 1)
    n = 150000  # several k_chunks=32 grid steps at c = 1408
    x2 = jnp.asarray((0.3 * rng.standard_normal((2, n))).astype(np.float32))
    g = jnp.asarray(np.linspace(0.5, 0.9, 8), jnp.float32)

    for hval in (0.0, 0.05, 0.2, 0.40):
        assert fir_damp_weights(hval) is not None, hval
        h = jnp.float32(hval)
        y_ref, d_ref, _ = comb_bank_file_sums(
            x2, lags, g, h, side_of, 2, use_pallas=False
        )
        y_p, d_p, _ = comb_bank_file_sums(
            x2, lags, g, h, side_of, 2, use_pallas="interpret",
            h_static=hval,
        )
        assert float(jnp.max(jnp.abs(y_p - y_ref))) < 1e-5, hval
        assert float(jnp.max(jnp.abs(d_p - d_ref))) < 1e-4, hval

    # Large h exceeds the tap budget -> scan fallback (still correct).
    assert fir_damp_weights(0.6) is None
    y_ref, d_ref, _ = comb_bank_file_sums(
        x2, lags, g, jnp.float32(0.6), side_of, 2, use_pallas=False
    )
    y_p, d_p, _ = comb_bank_file_sums(
        x2, lags, g, jnp.float32(0.6), side_of, 2, use_pallas="interpret",
        h_static=0.6,
    )
    assert float(jnp.max(jnp.abs(y_p - y_ref))) < 1e-5
