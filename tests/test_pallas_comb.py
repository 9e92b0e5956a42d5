"""VMEM-resident comb kernel vs the XLA chunked solve (interpret mode on
CPU; the TPU run matched bit-exactly, see PERF.md)."""

import numpy as np
import jax.numpy as jnp

from aefs_tpu.ops.ringbuf import comb_bank_file
from aefs_tpu.ops.pallas.comb import comb_bank_file_pallas


def test_pallas_comb_matches_xla_interpret():
    rng = np.random.default_rng(0)
    lags = (1411, 1782, 1973, 2098)
    n = 30000
    x = jnp.asarray((0.3 * rng.standard_normal((4, n))).astype(np.float32))
    g = jnp.asarray([0.9, 0.85, 0.8, 0.88], jnp.float32)
    h = jnp.float32(0.3)

    y_xla, d_xla = comb_bank_file(x, lags, g, h, use_pallas=False)

    c = (min(lags) // 128) * 128
    m = -(-n // c)
    n_pad = m * c
    xs = jnp.stack(
        [jnp.pad(x[i], (lag, n_pad - n))[:n_pad] for i, lag in enumerate(lags)]
    ).reshape(4, m, c)
    y_p, d_p = comb_bank_file_pallas(
        jnp.moveaxis(xs, 1, 0), g, h, lags, c, interpret=True
    )
    y_p = jnp.moveaxis(y_p, 0, 1).reshape(4, n_pad)[:, :n]
    d_p = jnp.moveaxis(d_p, 0, 1).reshape(4, n_pad)[:, :n]

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

    m = -(-n // c)
    n_pad = m * c
    xs = jnp.stack(
        [jnp.pad(x[i], (lag, n_pad - n))[:n_pad] for i, lag in enumerate(lags)]
    ).reshape(4, m, c)
    y_p, _ = comb_bank_file_pallas(
        jnp.moveaxis(xs, 1, 0), g, h, lags, c, interpret=True
    )
    y_p = jnp.moveaxis(y_p, 0, 1).reshape(4, n_pad)[:, :n]
    assert float(jnp.max(jnp.abs(y_p - y_xla))) < 1e-5
