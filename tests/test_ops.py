"""Unit tests for the blocked scan / ring-buffer op library."""

import numpy as np
import jax.numpy as jnp

from aefs_tpu.ops.scan import affine_scan, lag_affine_scan, linrec2, biquad_block
from aefs_tpu.ops.ringbuf import (
    ring_push,
    delay_read,
    feedback_delay_block,
    comb_damped_block,
    comb_bank_block,
    allpass_block,
    fractional_read_cubic,
)
from aefs_tpu.ops.fftops import (
    frame_signal,
    overlap_add,
    partitioned_fft_conv,
    partition_ir,
)

RNG = np.random.default_rng(42)


def test_affine_scan_matches_loop():
    n = 300
    m = RNG.uniform(0.2, 0.99, n).astype(np.float32)
    b = RNG.standard_normal(n).astype(np.float32)
    init = np.float32(0.7)
    y = np.asarray(affine_scan(jnp.asarray(m), jnp.asarray(b), init))
    ref = np.zeros(n)
    prev = float(init)
    for i in range(n):
        prev = m[i] * prev + b[i]
        ref[i] = prev
    assert np.max(np.abs(y - ref)) < 1e-4


def test_const_affine_hillis_matches_loop():
    from aefs_tpu.ops.scan import const_affine_hillis

    b, n = 5, 256
    h = RNG.uniform(0.1, 0.95, (b, 1)).astype(np.float32)
    add = RNG.standard_normal((b, n)).astype(np.float32)
    init = RNG.standard_normal((b, 1)).astype(np.float32)
    y = np.asarray(const_affine_hillis(jnp.asarray(h), jnp.asarray(add),
                                       jnp.asarray(init)))
    ref = np.zeros((b, n))
    prev = init[:, 0].astype(np.float64)
    for i in range(n):
        prev = h[:, 0] * prev + add[:, i]
        ref[:, i] = prev
    assert np.max(np.abs(y - ref)) < 1e-4
    # Scalar h / scalar init, non-power-of-two length.
    y1 = np.asarray(const_affine_hillis(jnp.float32(0.5),
                                        jnp.asarray(add[0, :44]),
                                        jnp.float32(0.25)))
    prev = 0.25
    for i in range(44):
        prev = 0.5 * prev + add[0, i]
        assert abs(y1[i] - prev) < 1e-4


def test_affine_scan_axis_and_broadcast():
    k, l = 7, 13
    add = RNG.standard_normal((k, l)).astype(np.float32)
    y = np.asarray(affine_scan(jnp.float32(0.5), jnp.asarray(add), jnp.zeros(l, jnp.float32), axis=0))
    ref = np.zeros((k, l))
    prev = np.zeros(l)
    for i in range(k):
        prev = 0.5 * prev + add[i]
        ref[i] = prev
    assert np.max(np.abs(y - ref)) < 1e-5


def test_lag_affine_scan():
    n, lag, a = 500, 37, 0.6
    base = RNG.standard_normal(n).astype(np.float32)
    y = np.asarray(lag_affine_scan(jnp.asarray(base), a, lag))
    ref = np.zeros(n)
    for i in range(n):
        ref[i] = base[i] + (a * ref[i - lag] if i >= lag else 0.0)
    assert np.max(np.abs(y - ref)) < 1e-5


def test_lag_affine_scan_path_boundaries():
    """All three row-count regimes against the float64 loop oracle: the
    tiny-M associative scan (m <= 8), the one-chunk Toeplitz matmul
    (8 < m <= row_chunk) and the multi-chunk Toeplitz + carry scan
    (m > row_chunk) — the blocking must be exact at every C."""
    a = 0.7
    for n, lag in ((200, 40),      # m = 5: scan path
                   (2000, 40),     # m = 50: one-chunk Toeplitz
                   (9000, 40),     # m = 225: two chunks at C=128
                   (9000, 13)):    # m = 693: many chunks
        base = RNG.standard_normal(n).astype(np.float32)
        y = np.asarray(lag_affine_scan(jnp.asarray(base), a, lag))
        ref = np.zeros(n)
        for i in range(n):
            ref[i] = base[i] + (a * ref[i - lag] if i >= lag else 0.0)
        err = np.max(np.abs(y - ref))
        assert err < 2e-4, (n, lag, err)
        # non-default row_chunk must agree with the default to f32 noise
        y2 = np.asarray(lag_affine_scan(jnp.asarray(base), a, lag,
                                        row_chunk=64))
        assert np.max(np.abs(y2 - y)) < 2e-4, (n, lag)


def test_linrec2_matches_loop():
    n = 400
    v = RNG.standard_normal(n).astype(np.float32)
    a1, a2 = -1.2, 0.8  # stable-ish resonant pair
    y = np.asarray(linrec2(jnp.asarray(v), a1, a2, 0.3, -0.1))
    ref = np.zeros(n)
    p1, p2 = 0.3, -0.1
    for i in range(n):
        cur = v[i] - a1 * p1 - a2 * p2
        ref[i] = cur
        p2, p1 = p1, cur
    assert np.max(np.abs(y - ref)) < 2e-4


def test_biquad_block_state_continuity():
    """Two half blocks must equal one full block."""
    x = RNG.standard_normal((2, 512)).astype(np.float32)
    coeffs = (0.2, 0.3, 0.1, -0.5, 0.2)
    st0 = jnp.zeros((2, 4), jnp.float32)
    y_full, _ = biquad_block(jnp.asarray(x), *coeffs, st0)
    y1, st = biquad_block(jnp.asarray(x[:, :256]), *coeffs, st0)
    y2, _ = biquad_block(jnp.asarray(x[:, 256:]), *coeffs, st)
    y_split = jnp.concatenate([y1, y2], axis=1)
    assert np.max(np.abs(np.asarray(y_full) - np.asarray(y_split))) < 1e-5


def test_ring_push_and_delay_read():
    hist = jnp.arange(10, dtype=jnp.float32)  # chronological 0..9
    x = jnp.asarray([100.0, 101.0, 102.0], jnp.float32)
    assert np.allclose(np.asarray(ring_push(hist, x))[-3:], [100, 101, 102])
    # delay 2: y[n] = stream[n-2]; stream index 10+n-2
    y = np.asarray(delay_read(hist, x, jnp.int32(2)))
    assert np.allclose(y, [8, 9, 100])
    y0 = np.asarray(delay_read(hist, x, jnp.int32(0)))
    assert np.allclose(y0, [100, 101, 102])


def test_feedback_delay_block_vs_loop():
    """Fixed-point solve vs per-sample simulation, including dS < N."""
    s, n = 64, 256
    for d in (5, 17, 63, 200 % s or 50):
        hist = RNG.standard_normal(s).astype(np.float32) * 0.1
        x = RNG.standard_normal(n).astype(np.float32) * 0.3
        fb = 0.5
        y, new_hist = feedback_delay_block(
            jnp.asarray(hist), jnp.asarray(x), jnp.int32(d), fb, min_delay=5
        )
        # reference loop in chronological coordinates
        stream = list(hist)
        ref = np.zeros(n)
        for i in range(n):
            ref[i] = stream[s + i - d]
            stream.append(x[i] + fb * ref[i])
        assert np.max(np.abs(np.asarray(y) - ref)) < 1e-4, f"d={d}"
        assert np.allclose(np.asarray(new_hist), stream[-s:], atol=1e-4)


def test_comb_damped_block_vs_loop():
    for lag, n in ((100, 64), (100, 100), (50, 256)):
        hist = RNG.standard_normal(lag).astype(np.float32) * 0.1
        x = RNG.standard_normal(n).astype(np.float32) * 0.3
        g, h, lp0 = 0.8, 0.3, 0.05
        y, new_hist, lp = comb_damped_block(
            jnp.asarray(hist), jnp.float32(lp0), jnp.asarray(x), g, h
        )
        # reference loop: read index is (written count so far) - lag
        stream = list(hist)
        ref = np.zeros(n)
        lp_ref = lp0
        for i in range(n):
            v = stream[len(stream) - lag]
            damped = (1 - h) * v + h * lp_ref
            lp_ref = damped
            ref[i] = v
            stream.append(x[i] + g * damped)
        assert np.max(np.abs(np.asarray(y) - ref)) < 1e-4, (lag, n)
        assert abs(float(lp) - lp_ref) < 1e-4
        assert np.allclose(np.asarray(new_hist), stream[-lag:], atol=1e-4)


def test_comb_bank_block_matches_scalar():
    lags = [90, 100, 110]
    lmax = max(lags)
    n = 256
    x = RNG.standard_normal(n).astype(np.float32) * 0.3
    g = np.asarray([0.7, 0.8, 0.75], np.float32)
    h = 0.25
    hists_pad = np.zeros((3, lmax), np.float32)
    raw_hists = []
    for i, lag in enumerate(lags):
        hh = RNG.standard_normal(lag).astype(np.float32) * 0.1
        raw_hists.append(hh)
        hists_pad[i, -lag:] = hh
    lps = np.asarray([0.01, -0.02, 0.0], np.float32)

    y, new_hists, new_lps = comb_bank_block(
        jnp.asarray(hists_pad), jnp.asarray(lps), jnp.asarray(x),
        jnp.asarray(lags, jnp.int32), jnp.asarray(g), jnp.float32(h),
        min_lag=min(lags),
    )
    for i, lag in enumerate(lags):
        ys, nh, nlp = comb_damped_block(
            jnp.asarray(raw_hists[i]), jnp.float32(lps[i]), jnp.asarray(x),
            jnp.float32(g[i]), jnp.float32(h),
        )
        assert np.max(np.abs(np.asarray(y[i]) - np.asarray(ys))) < 1e-4
        assert np.allclose(np.asarray(new_hists[i, -lag:]), np.asarray(nh), atol=1e-4)
        assert abs(float(new_lps[i]) - float(nlp)) < 1e-4


def test_allpass_block_vs_loop():
    for lag, n in ((81, 256), (240, 256), (300, 256), (81, 1024)):
        hist = RNG.standard_normal(lag).astype(np.float32) * 0.1
        x = RNG.standard_normal(n).astype(np.float32) * 0.3
        a = 0.6
        y, new_hist = allpass_block(jnp.asarray(hist), jnp.asarray(x), a, lag)
        stream = list(hist)
        ref = np.zeros(n)
        for i in range(n):
            delayed = stream[len(stream) - lag]
            ref[i] = delayed - a * x[i]
            stream.append(x[i] + a * ref[i])
        assert np.max(np.abs(np.asarray(y) - ref)) < 1e-4, (lag, n)
        assert np.allclose(np.asarray(new_hist), stream[-lag:], atol=1e-4)


def test_fractional_read_cubic_integer_ago():
    """At integer distances with frac=0 the tap is an exact read."""
    s, n = 32, 8
    hist = RNG.standard_normal(s).astype(np.float32)
    x = RNG.standard_normal(n).astype(np.float32)
    ago = np.full(n, 5.0, np.float32)
    y = np.asarray(fractional_read_cubic(jnp.asarray(hist), jnp.asarray(x), jnp.asarray(ago)))
    ext = np.concatenate([hist, x])
    expect = ext[s + np.arange(n) - 5]
    assert np.max(np.abs(y - expect)) < 1e-5


def test_frame_and_overlap_roundtrip():
    hop, k = 64, 5
    n_fft = 2 * hop
    tail = np.zeros(n_fft - hop, np.float32)
    x = RNG.standard_normal(k * hop).astype(np.float32)
    frames, new_tail = frame_signal(jnp.asarray(tail), jnp.asarray(x), n_fft, hop)
    assert frames.shape == (k, n_fft)
    assert np.allclose(np.asarray(frames)[2], np.concatenate([tail, x])[2 * hop : 2 * hop + n_fft])
    assert np.allclose(np.asarray(new_tail), x[-hop:])

    ola_tail = np.zeros(hop, np.float32)
    y, nt = overlap_add(frames, jnp.asarray(ola_tail), hop)
    ref = np.zeros(k * hop)
    fr = np.asarray(frames)
    for i in range(k):
        ref[i * hop : (i + 1) * hop] += fr[i, :hop]
        if i + 1 < k:
            ref[(i + 1) * hop : (i + 2) * hop] += fr[i, hop:]
    assert np.max(np.abs(np.asarray(y) - ref)) < 1e-5


def test_partitioned_conv_matches_direct():
    hop = 64
    ir = (RNG.standard_normal(300) * np.exp(-np.arange(300) / 80)).astype(np.float32)
    spectra = partition_ir(ir, hop)
    x = RNG.standard_normal(8 * hop).astype(np.float32) * 0.5

    p = spectra.shape[1]
    spec_hist = jnp.zeros((2, p - 1, hop + 1), jnp.float32)
    in_tail = jnp.zeros(hop, jnp.float32)
    # stream in two chunks to exercise the carried state
    y1, spec_hist, in_tail = partitioned_fft_conv(spec_hist, in_tail, jnp.asarray(x[: 4 * hop]), spectra, hop)
    y2, _, _ = partitioned_fft_conv(spec_hist, in_tail, jnp.asarray(x[4 * hop :]), spectra, hop)
    y = np.concatenate([np.asarray(y1), np.asarray(y2)])

    ref = np.convolve(x.astype(np.float64), ir.astype(np.float64))[: len(x)]
    assert np.max(np.abs(y - ref)) < 1e-3  # float32 FFT conv vs float64 direct


def test_linrec2_file_matches_loop():
    """Chunked Toeplitz solve == per-sample recurrence (incl. a ragged
    tail chunk and nonzero initial conditions)."""
    from aefs_tpu.ops.scan import linrec2_file

    n = 5 * 256 + 37
    v = RNG.standard_normal(n).astype(np.float32)
    a1, a2 = -1.2, 0.8
    y = np.asarray(linrec2_file(jnp.asarray(v), a1, a2, 0.3, -0.1, chunk=256))
    ref = np.zeros(n)
    p1, p2 = 0.3, -0.1
    for i in range(n):
        cur = v[i] - a1 * p1 - a2 * p2
        ref[i] = cur
        p2, p1 = p1, cur
    assert np.max(np.abs(y - ref)) < 2e-4


def test_affine_scan_long_matches_affine_scan():
    from aefs_tpu.ops.scan import affine_scan_long

    n = 3 * 512 + 123
    mult = (0.8 + 0.2 * RNG.random(n)).astype(np.float32)
    add = RNG.standard_normal(n).astype(np.float32)
    a = np.asarray(affine_scan(jnp.asarray(mult), jnp.asarray(add), 0.4))
    b = np.asarray(affine_scan_long(jnp.asarray(mult), jnp.asarray(add), 0.4))
    assert np.max(np.abs(a - b)) < 1e-5


def test_maxtimes_hillis_matches_loop():
    """(max, x)-semiring scan (compressor peak-detector decay stage):
    y[n] = max(add[n], mult[n] * y[n-1]) vs a float64 loop."""
    from aefs_tpu.ops.scan import maxtimes_hillis

    n = 300
    m = RNG.uniform(0.9, 0.9999, n).astype(np.float32)
    b = np.abs(RNG.standard_normal(n)).astype(np.float32)
    b[n // 3: 2 * n // 3] = 0.0  # long decay run exercises the products
    init = np.float32(0.7)
    y = np.asarray(maxtimes_hillis(jnp.asarray(m), jnp.asarray(b), init))
    ref = np.zeros(n)
    prev = float(init)
    for i in range(n):
        prev = max(float(b[i]), float(m[i]) * prev)
        ref[i] = prev
    assert np.max(np.abs(y - ref)) < 1e-5
    # batched last-axis form
    mb = RNG.uniform(0.5, 1.0, (4, 64)).astype(np.float32)
    bb = np.abs(RNG.standard_normal((4, 64))).astype(np.float32)
    yb = np.asarray(maxtimes_hillis(jnp.asarray(mb), jnp.asarray(bb),
                                    jnp.zeros((4, 1), jnp.float32)))
    for r in range(4):
        prev = 0.0
        for i in range(64):
            prev = max(float(bb[r, i]), float(mb[r, i]) * prev)
            assert abs(yb[r, i] - prev) < 1e-5


def test_maxtimes_scan_long_matches_hillis():
    from aefs_tpu.ops.scan import maxtimes_hillis, maxtimes_scan_long

    n = 3 * 512 + 123
    mult = RNG.uniform(0.99, 0.99999, n).astype(np.float32)
    add = np.abs(RNG.standard_normal(n)).astype(np.float32)
    add[512:2048] = 0.0  # decay spans several chunks -> cross-row carry
    a = np.asarray(maxtimes_hillis(jnp.asarray(mult), jnp.asarray(add), 0.4))
    b = np.asarray(maxtimes_scan_long(jnp.asarray(mult), jnp.asarray(add), 0.4))
    assert np.max(np.abs(a - b)) < 1e-5


def test_feedback_delay_rowring_matches_chronological():
    """Block-row-ring feedback delay == chronological-buffer version over a
    multi-block stream (including a wrap of the row ring)."""
    from aefs_tpu.ops.ringbuf import (
        feedback_delay_block_rows,
        rowring_rows,
        rowring_push,
    )

    n = 64
    size = 300  # -> 6 rows, wraps within the test
    r = rowring_rows(size, n)
    d = jnp.int32(175)
    fb = 0.55
    hist = jnp.zeros((size,), jnp.float32)
    ring = jnp.zeros((r, n), jnp.float32)
    row = jnp.int32(0)
    for i in range(12):
        x = jnp.asarray(RNG.standard_normal(n).astype(np.float32) * 0.4)
        y_ref, hist = feedback_delay_block(hist, x, d, fb, 48)
        y_row, ring = feedback_delay_block_rows(ring, row, x, d, fb, 48)
        row = jnp.mod(row + 1, r)
        assert np.max(np.abs(np.asarray(y_ref) - np.asarray(y_row))) < 1e-6, i


def test_lane_dynamic_slice_and_chrono_window():
    from aefs_tpu.ops.ringbuf import lane_dynamic_slice, chrono_window

    v = RNG.standard_normal(512).astype(np.float32)
    for start in (0, 1, 100, 256):
        got = np.asarray(lane_dynamic_slice(jnp.asarray(v), jnp.int32(start), 256))
        assert np.array_equal(got, v[start : start + 256]), start
    # batched leading dims
    vb = RNG.standard_normal((3, 512)).astype(np.float32)
    got = np.asarray(lane_dynamic_slice(jnp.asarray(vb), jnp.int32(77), 256))
    assert np.array_equal(got, vb[:, 77:333])

    e = RNG.standard_normal(1000).astype(np.float32)
    for start in (0, 3, 700, 744):
        got = np.asarray(chrono_window(jnp.asarray(e), jnp.int32(start), 256))
        assert np.array_equal(got, e[start : start + 256]), start


def _h_ref(a1, a2, n):
    ref = np.zeros(n)
    ref[0] = 1.0
    if n > 1:
        ref[1] = -a1
    for i in range(2, n):
        ref[i] = -a1 * ref[i - 1] - a2 * ref[i - 2]
    return ref


def test_ar2_impulse_matches_recurrence():
    from aefs_tpu.ops.scan import ar2_impulse

    a1, a2 = -1.2, 0.8
    h = np.asarray(ar2_impulse(a1, a2, 300))
    assert np.max(np.abs(h - _h_ref(a1, a2, 300))) < 2e-4


def test_ar2_impulse_all_pole_branches_stable():
    """Closed-form AR(2) impulse across complex / real / near-critical
    pole structures over the LEGAL RBJ biquad range, including the
    near-unit-radius draws where the old log-doubling was catastrophically
    unstable (|err| ~ 20 at fc=136 Hz, Q=6.1 — fuzz seed 25)."""
    from aefs_tpu.ops.scan import ar2_impulse

    fs = 48000
    for fc in (20.0, 136.094, 847.07, 4567.15, 12000.0, 19000.0):
        for q in (0.1, 0.3, 0.51, 0.707, 6.091, 10.0):
            w0 = 2 * np.pi * fc / fs
            al = np.sin(w0) / (2 * q)
            a1 = (-2 * np.cos(w0)) / (1 + al)
            a2 = (1 - al) / (1 + al)
            h = np.asarray(ar2_impulse(np.float32(a1), np.float32(a2), 257))
            ref = _h_ref(a1, a2, 257)
            assert np.all(np.isfinite(h)), (fc, q)
            rel = np.max(np.abs(h - ref)) / max(np.max(np.abs(ref)), 1e-9)
            assert rel < 0.02, (fc, q, rel)


def test_linrec2_file_stable_at_near_unit_poles():
    """Fuzz seed 25 regression: the chunked Toeplitz file solve at pole
    radius 0.9985 (HP fc=136 Hz, Q=6.09) used to return ~1e27; it must
    stay within float32 conditioning of the float64 recurrence and of
    the streaming companion scan."""
    from aefs_tpu.ops.scan import linrec2, linrec2_file

    fs, fc, q = 48000, 136.094, 6.091
    w0 = 2 * np.pi * fc / fs
    al = np.sin(w0) / (2 * q)
    a1 = (-2 * np.cos(w0)) / (1 + al)
    a2 = (1 - al) / (1 + al)
    rng = np.random.default_rng(0)
    n = 4096
    v = (0.3 * rng.standard_normal(n)).astype(np.float32)
    ref = np.zeros(n)
    y1 = y2 = 0.0
    for i in range(n):
        y = float(v[i]) - a1 * y1 - a2 * y2
        ref[i] = y
        y2, y1 = y1, y
    args = (jnp.asarray(v), jnp.float32(a1), jnp.float32(a2),
            jnp.float32(0), jnp.float32(0))
    yf = np.asarray(linrec2_file(*args))
    ys = np.asarray(linrec2(*args))
    rm = np.max(np.abs(ref))
    assert np.all(np.isfinite(yf))
    assert np.max(np.abs(yf - ref)) / rm < 0.02
    assert np.max(np.abs(yf - ys)) / rm < 0.03


def test_comb_bank_block_static_matches_dynamic():
    from aefs_tpu.ops.ringbuf import comb_bank_block_static

    lags = (300, 350, 400, 410)
    lmax = max(lags)
    n = 256
    g = jnp.asarray([0.8, 0.78, 0.76, 0.75], jnp.float32)
    h = 0.3
    hists_a = jnp.asarray(RNG.standard_normal((4, lmax)).astype(np.float32) * 0.2)
    hists_b = hists_a
    lps_a = jnp.asarray([0.1, -0.2, 0.05, 0.0], jnp.float32)
    lps_b = lps_a
    for i in range(4):
        x = jnp.asarray(RNG.standard_normal((n,)).astype(np.float32) * 0.3)
        ya, hists_a, lps_a = comb_bank_block(
            hists_a, lps_a, x, jnp.asarray(lags, jnp.int32), g, h, min(lags))
        yb, hists_b, lps_b = comb_bank_block_static(hists_b, lps_b, x, lags, g, h)
        assert np.max(np.abs(np.asarray(ya) - np.asarray(yb))) < 1e-5, i
        assert np.max(np.abs(np.asarray(hists_a) - np.asarray(hists_b))) < 1e-4, i


def test_two_sum_error_free_property():
    """Brute-force the TwoSum invariant s + e == a + b EXACTLY (in f64 —
    f32 pairs sum exactly in f64) over adversarial magnitude mixes.  The
    scrambled variant this guards against (octaver._two_sum history)
    passes same-magnitude cases but fails the mixed-magnitude ones by up
    to ulp(a)/2."""
    from aefs_tpu.models.octaver import _two_sum

    rng = np.random.default_rng(7)
    mags = [1.0, 1e-3, 1e-6, 2.9e-6, 0.97]
    a = np.concatenate([
        (rng.standard_normal(400) * m).astype(np.float32) for m in mags
    ])
    b = np.concatenate([
        (rng.standard_normal(400) * m).astype(np.float32)
        for m in reversed(mags)
    ])
    s, e = _two_sum(jnp.asarray(a), jnp.asarray(b))
    s = np.asarray(s, np.float64)
    e = np.asarray(e, np.float64)
    exact = a.astype(np.float64) + b.astype(np.float64)
    assert np.array_equal(s + e, exact)


def test_split12_veltkamp_property():
    """split12 (octaver phase path): v == hi + lo exactly, and hi carries
    at most 12 mantissa bits (so j * hi is exact for j < 4096)."""
    import aefs_tpu.models.octaver as oct_mod

    # the splitter is module-internal; reconstruct it the way process() does
    def split12(v):
        c = v * np.float32(4097.0)
        hi = np.float32(c - np.float32(c - v))
        return hi, np.float32(v - hi)

    rng = np.random.default_rng(8)
    for v in (rng.standard_normal(2000) * 1e-4).astype(np.float32):
        hi, lo = split12(v)
        assert float(hi) + float(lo) == float(v)
        if hi != 0:
            m, _ = np.frexp(hi)
            # 12-bit mantissa: m * 2^12 is an integer
            assert float(m) * 4096.0 == int(float(m) * 4096.0)
        # j * hi exact for j up to 4095
        j = np.float32(4095.0)
        assert float(j * hi) == 4095.0 * float(hi)


def test_window_min_and_sum_trailing_match_numpy():
    """Log-doubling trailing-window min and binary-disjoint window sums
    (ops/scan.py) vs brute force, across window sizes incl. powers of
    two, w=1, and the full-history edge."""
    from aefs_tpu.ops.scan import window_min_trailing, window_sum_trailing

    rng = np.random.default_rng(5)
    for w in (1, 2, 3, 7, 8, 13, 64, 100, 241):
        n = 300
        h = w - 1
        ext = rng.standard_normal((2, h + n)).astype(np.float32)
        got_min = np.asarray(window_min_trailing(jnp.asarray(ext), w, n))
        got_sum = np.asarray(window_sum_trailing(jnp.asarray(ext), w, n))
        ref_min = np.stack([
            [ext[c, j - w + 1: j + 1].min() for j in range(h, h + n)]
            for c in range(2)
        ])
        ref_sum = np.stack([
            [ext[c, j - w + 1: j + 1].astype(np.float64).sum()
             for j in range(h, h + n)]
            for c in range(2)
        ])
        np.testing.assert_array_equal(got_min, ref_min.astype(np.float32),
                                      err_msg=f"w={w}")
        np.testing.assert_allclose(got_sum, ref_sum, rtol=0, atol=1e-4,
                                   err_msg=f"w={w}")


def test_minaffine_hillis_matches_sequential():
    """y[n] = min(cap, a*y[n-1] + b) — the limiter's release recurrence —
    vs a float64 sequential loop."""
    from aefs_tpu.ops.scan import minaffine_hillis

    rng = np.random.default_rng(6)
    n = 777
    a = rng.uniform(0.9, 0.9999, n).astype(np.float32)
    b = rng.uniform(0.0, 0.1, n).astype(np.float32)
    cap = rng.uniform(0.0, 1.0, n).astype(np.float32)
    init = 0.7
    got = np.asarray(minaffine_hillis(
        jnp.asarray(a)[None], jnp.asarray(b)[None], jnp.asarray(cap)[None],
        jnp.float32(init)))[0]
    y = init
    ref = np.zeros(n)
    for i in range(n):
        y = min(float(cap[i]), float(a[i]) * y + float(b[i]))
        ref[i] = y
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


def test_mat2_affine_hillis_matches_sequential():
    """Per-sample 2x2 matrix recurrence (the wah's swept SVF) vs a
    float64 sequential loop, incl. a rotation-heavy draw."""
    from aefs_tpu.ops.scan import mat2_affine_hillis

    rng = np.random.default_rng(7)
    n = 512
    th = rng.uniform(0.0, 0.3, n)
    r = rng.uniform(0.95, 0.999, n)
    mp = (r * np.cos(th)).astype(np.float32)
    mq = (r * np.sin(th)).astype(np.float32)
    mr = (-r * np.sin(th)).astype(np.float32)
    ms = (r * np.cos(th)).astype(np.float32)
    bu = rng.standard_normal(n).astype(np.float32) * 0.1
    bv = rng.standard_normal(n).astype(np.float32) * 0.1
    i1, i2 = 0.3, -0.2
    g1, g2 = mat2_affine_hillis(
        *(jnp.asarray(v)[None] for v in (mp, mq, mr, ms, bu, bv)),
        jnp.float32(i1), jnp.float32(i2))
    s = np.array([i1, i2])
    ref = np.zeros((n, 2))
    for i in range(n):
        m = np.array([[mp[i], mq[i]], [mr[i], ms[i]]], np.float64)
        s = m @ s + np.array([bu[i], bv[i]], np.float64)
        ref[i] = s
    np.testing.assert_allclose(np.asarray(g1)[0], ref[:, 0], rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(g2)[0], ref[:, 1], rtol=0, atol=5e-5)
