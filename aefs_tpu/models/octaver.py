"""Granular delay-line pitch shifter (parity target: reference octaver.py).

Two read taps driven by phasors offset 0.5 apart, Hann crossfade gains,
4-point Hermite interpolation (pitch_shift_kernel_cubic, octaver.py:17-82).

TPU mapping: the phasor is affine per sample — p[n] = (p0 + n*step) mod 1 —
so the whole kernel collapses into one parallel gather + interpolation
(SURVEY.md §7: "ideal TPU work").  The octaver writes *raw input* into its
ring, so there is no feedback recurrence at all.  The block-to-block phasor
carry uses a TwoSum-compensated accumulator to keep long-run drift at the
eps^2 level instead of a per-block eps random walk.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from aefs_tpu.core.params import ParamSpec
from aefs_tpu.models.base import EffectModel
from aefs_tpu.ops.ringbuf import fractional_read_cubic, ring_push


def _two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth TwoSum).

    e = (a - a') + (b - b') with the VIRTUAL operands a' = s - b',
    b' = s - a.  (A scrambled pairing — (a - b') + (b - a') — looks
    plausible and passes casual tests, but its compensation term is
    rounding noise: the phasor carry then drifts ~eps/2 per block and
    256-sample streaming diverged from 4096-superblock processing at
    -37..-60 dBFS.  Caught by the random-topology fuzzer,
    tests/test_fuzz_topologies.py.)"""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


class Octaver(EffectModel):
    kind = "octaver"

    # Bounds/steps from OctaverEffect (octaver.py:87-88, :117-118).
    PARAMS = {
        "semitones": ParamSpec(-12.0, -24.0, 24.0, smooth="step", step=0.5),
        "mix": ParamSpec(0.5, 0.0, 1.0, smooth="step", step=0.05),
    }

    def __init__(self, fs, blocksize, channels=2, window_ms=40.0,
                 file_semitones=None, resample_tile=None,
                 grid_semitones=None, grid_phase_lock=False, **config):
        super().__init__(fs, blocksize, channels)
        # Grain window; minimum size guards tiny rates (octaver.py:106).
        self.size = max(int(fs * float(window_ms) / 1000.0), 16)
        # Banded-resample geometry (ops/pallas/resample.py): the per-tile
        # position span is ratio * tile, so the window can shrink when the
        # pitch ratio is baked static (file mode); streaming uses the
        # worst case over the +-24 semitone param range.
        # ``resample_tile`` overrides the streaming tile (the window, and
        # with it the kernel's one-hot band work, scales ~4*tile).
        if file_semitones is not None:
            ratio = 2.0 ** (abs(float(file_semitones)) / 12.0)
            self.rs_tile = 256 if ratio <= 2.0 else 128
            span = int(np.ceil(ratio * self.rs_tile)) + 24
        else:
            self.rs_tile = int(resample_tile or 128)
            span = 4 * self.rs_tile + 24
        self.rs_window = -(-(span + 6) // 128) * 128
        # Resampling needs whole tiles, and the low/high cluster split
        # assumes clusters (span ratio*tile) are separated by >= size/2.
        self.use_resample = (
            blocksize % self.rs_tile == 0 and self.size > 2 * span
        )
        # Whole-octave file mode: exact closed-form grid taps
        # (ops/gridtaps.py) — gather-free AND free of the float32
        # phase-accumulation floor (parity reaches -80 dBFS).
        from aefs_tpu.ops.gridtaps import pow2_exponent, pow2_geometry_ok

        e = pow2_exponent(file_semitones)
        self._pow2_e = e if e is not None and pow2_geometry_ok(self.size, e) else None
        # Whole-octave STREAMING specialization (opt-in static): the phase
        # is carried as an exact integer numerator and the taps evaluated
        # on the rational grid every block (ops/gridtaps.py:
        # octaver_taps_pow2_stream) — streaming parity reaches -80 dBFS
        # and the per-block tap cost drops to a few dynamic slices.  The
        # ``semitones`` target is baked; live semitone changes require a
        # rebuild (the engine's default interactive path therefore keeps
        # the runtime float phasor — CLAUDE.md live-param rule).
        from aefs_tpu.ops.gridtaps import pow2_stream_geometry_ok

        ge = pow2_exponent(grid_semitones)
        self._grid_e = (
            ge if ge is not None and pow2_stream_geometry_ok(self.size, ge, blocksize)
            else None
        )
        # Phase-locked grid (batched serving): the integer phase lives in a
        # shared "grid_phase" pseudo-param the DRIVER advances each block
        # (server/pool.py advances it host-side), instead of per-stream
        # state.  A batch-uniform phase keeps every tap slice start
        # unbatched under vmap — the 12x dynamic-slice lowering cliff
        # (ops/gridtaps.py:_slice1).  Absolute grain phase is inaudible,
        # so sessions joining a running pool at the shared phase match the
        # reference semantics from their own first block.
        self._phase_lock = bool(grid_phase_lock) and self._grid_e is not None
        if self._phase_lock:
            self.PARAMS = {
                **self.PARAMS,
                "grid_phase": ParamSpec(0.0, 0.0, float(2 ** 24)),
            }
        # Double-single pitch-ratio table for the 0.5-semitone grid (every
        # UI-reachable value: slider step 0.5, octaver.py:117-118).  The
        # dominant drift of the generic phase path vs a float64 oracle is
        # the f32 quantization of ratio = 2^(s/12) itself (~2^-25 relative
        # -> ~8e-12 of phase per sample, i.e. -60 dBFS by ~8 s): when the
        # smoothed ``semitones`` lands EXACTLY on the grid, the ratio is
        # upgraded to hi+lo float32 pairs of the float64 value and the
        # step is carried double-single end to end, removing the
        # length-proportional term entirely (off-grid values keep the
        # plain f32 ratio — bitwise the old behavior).
        ks = np.arange(-48, 49)
        r64 = 2.0 ** ((ks / 2.0) / 12.0)
        self._ratio_tab_hi = r64.astype(np.float32)
        self._ratio_tab_lo = (r64 - self._ratio_tab_hi.astype(np.float64)
                              ).astype(np.float32)

    def grid_phase_advance(self, n=None):
        """(per-block advance, modulus) of the integer phase numerator —
        the recurrence a phase-locking driver must apply per block."""
        e = self._grid_e
        n = self.blocksize if n is None else int(n)
        if e < 0:
            d = 1 << (-e)
            return (n * (d - 1)) % (d * self.size), d * self.size
        r = 1 << e
        return (-n * (r - 1)) % self.size, self.size

    def init_state(self):
        if self._grid_e is not None:
            if self._phase_lock:  # phase arrives via the grid_phase param
                return {"hist": jnp.zeros((self.size,), jnp.float32)}
            return {
                "hist": jnp.zeros((self.size,), jnp.float32),
                "num": jnp.int32(0),
            }
        return {
            "hist": jnp.zeros((self.size,), jnp.float32),
            "phasor": jnp.float32(0.0),
            "comp": jnp.float32(0.0),
        }

    def _process_grid(self, state, p, x):
        """Exact-grid streaming step (grid_semitones baked; only ``mix``
        stays live).  Phase carried as an integer numerator — no float
        accumulation anywhere on the tap path."""
        from aefs_tpu.ops.gridtaps import octaver_taps_pow2_stream

        mix = p["mix"]
        mono = jnp.mean(x, axis=0)  # octaver.py:126-128
        num0 = (
            p["grid_phase"].astype(jnp.int32) if self._phase_lock
            else state["num"]
        )
        s1, s2, p1, p2, num = octaver_taps_pow2_stream(
            state["hist"], mono, self._grid_e, num0
        )
        two_pi = jnp.float32(2.0 * jnp.pi)
        g1 = 0.5 * (1.0 - jnp.cos(two_pi * p1))  # octaver.py:66-67
        g2 = 0.5 * (1.0 - jnp.cos(two_pi * p2))
        wet = s1 * g1 + s2 * g2
        new_state = {"hist": ring_push(state["hist"], mono)}
        if not self._phase_lock:
            new_state["num"] = num
        y = x * (1.0 - mix) + wet[None, :] * mix
        return new_state, y

    def process(self, state, p, x):
        if self._grid_e is not None:
            return self._process_grid(state, p, x)
        size = self.size
        n = x.shape[-1]
        ratio = jnp.power(2.0, p["semitones"] / 12.0)
        mix = p["mix"]

        mono = jnp.mean(x, axis=0)  # octaver.py:126-128

        # Phase path in split-float32 so the result is blocksize-invariant
        # from 256-sample streaming blocks up to whole files: Veltkamp-split
        # the step into a 12-bit-mantissa high part (j * s_hi is exact for
        # j < 4096 and its mod-1 residue exactly representable) plus a low
        # part whose product rounding is ~1e-11.  Blocks longer than 4096
        # use a second level over superblock strides m * (4096 * step) —
        # fl(n * step) directly at n ~ 10^6 would carry ~2^-12 absolute
        # error (a 0.1+ sample tap jitter).
        def split12(v):
            c = v * jnp.float32(4097.0)
            hi = c - (c - v)
            return hi, v - hi

        # Grid-exact double-single ratio (see __init__ table note): when
        # 2*semitones is exactly an integer in [-48, 48], replace the f32
        # ratio with the hi+lo pair of the float64 value.  The lookup is a
        # one-hot masked reduction (no gather — CLAUDE.md TPU rule).
        s2x = p["semitones"] * jnp.float32(2.0)  # exact (x2 = exponent shift)
        k_idx = jnp.round(s2x)
        on_grid = s2x == k_idx
        oh = (jnp.arange(97, dtype=jnp.float32) == k_idx + 48.0).astype(
            jnp.float32
        )
        ratio_hi = jnp.where(
            on_grid & (jnp.sum(oh) > 0),
            jnp.sum(oh * jnp.asarray(self._ratio_tab_hi)), ratio,
        )
        ratio_lo = jnp.sum(oh * jnp.asarray(self._ratio_tab_lo)) * jnp.where(
            on_grid, 1.0, 0.0
        )
        # step = (1 - ratio_hi - ratio_lo)/size in double-single:
        # d = 1 - ratio_hi exactly (TwoSum), the division remainder
        # recovered with an exact split product (1920*a_hi needs 12+11
        # mantissa bits), so step_hi + step_lo matches the float64 step to
        # ~2^-45 — the phase carry below then accumulates it exactly.
        size_f = jnp.float32(size)
        d_hi, d_e = _two_sum(jnp.float32(1.0), -ratio_hi)
        num_lo = d_e - ratio_lo
        step_hi = d_hi / size_f
        a_hi, a_lo = split12(step_hi)
        rem = (d_hi - a_hi * size_f) - a_lo * size_f
        step_lo = (rem + num_lo) / size_f
        step = step_hi  # the f32 value (== old fl((1-ratio)/size) on-grid)

        inner_n = min(n, 4096)
        m = -(-n // inner_n)
        s_hi, s_lo = split12(step)
        s_lo = s_lo + step_lo  # fold the double-single correction
        j_idx = jnp.arange(inner_n, dtype=jnp.float32)
        inner = jnp.mod(j_idx * s_hi, 1.0) + j_idx * s_lo
        base = state["phasor"] + state["comp"]
        if m > 1:
            delta = jnp.float32(inner_n) * step  # exact: 2^12 scale
            d_hi, d_lo = split12(delta)
            d_lo = d_lo + jnp.float32(inner_n) * step_lo  # exact scale
            m_idx = jnp.arange(m, dtype=jnp.float32)
            outer = jnp.mod(m_idx * d_hi, 1.0) + m_idx * d_lo
            p1 = jnp.mod(outer[:, None] + inner[None, :] + base, 1.0)
            p1 = p1.reshape(m * inner_n)[:n]
        else:
            p1 = jnp.mod(inner[:n] + base, 1.0)
        p2 = jnp.mod(p1 + 0.5, 1.0)

        hist = state["hist"]
        if self.use_resample:
            from aefs_tpu.ops.ringbuf import fractional_read_resample2

            s1, s2 = fractional_read_resample2(
                hist, mono, p1 * size, p2 * size, self.rs_tile, self.rs_window
            )
        else:
            s1 = fractional_read_cubic(hist, mono, p1 * size)
            s2 = fractional_read_cubic(hist, mono, p2 * size)

        two_pi = jnp.float32(2.0 * jnp.pi)
        g1 = 0.5 * (1.0 - jnp.cos(two_pi * p1))  # Hann crossfade (octaver.py:66-67)
        g2 = 0.5 * (1.0 - jnp.cos(two_pi * p2))
        wet = s1 * g1 + s2 * g2

        # Compensated phasor carry: advance by n*step decomposed as
        # q*(4096*step) + r*step with each product split so its mod-1
        # residue is exact; all rounding folds into the TwoSum compensation
        # term, keeping cross-block drift at the eps^2 level.
        q, r = divmod(n, 4096)
        delta = jnp.float32(4096) * step
        d_hi, d_lo = split12(delta)
        d_lo = d_lo + jnp.float32(4096) * step_lo  # double-single correction
        parts = []
        if q:
            parts += [jnp.mod(jnp.float32(q) * d_hi, 1.0), jnp.float32(q) * d_lo]
        if r:
            # s_lo already carries step_lo (folded at the ramp above)
            parts += [jnp.mod(jnp.float32(r) * s_hi, 1.0), jnp.float32(r) * s_lo]
        acc, err = state["phasor"], state["comp"]
        for part in parts:
            acc, e = _two_sum(acc, part)
            err = err + e
        new_state = {
            "hist": ring_push(hist, mono),
            "phasor": jnp.mod(acc, 1.0),  # exact integer subtraction
            "comp": err,
        }

        # Linear dry/wet blend preserving the dry stereo image
        # (octaver.py:143-150).
        y = x * (1.0 - mix) + wet[None, :] * mix
        return new_state, y

    def process_file(self, state, p, x):
        """Whole-file fast path.  At whole-octave baked ratios the taps are
        evaluated in closed form on the exact rational position grid
        (ops/gridtaps.py) — assumes the file-mode contract (fresh phase,
        params at their baked targets, models/base.py:54-63)."""
        if self._pow2_e is None:
            return self.process(state, p, x)
        from aefs_tpu.ops.gridtaps import octaver_taps_pow2

        e = self._pow2_e
        size = self.size
        n = x.shape[-1]
        mix = p["mix"]
        mono = jnp.mean(x, axis=0)  # octaver.py:126-128
        hist = state["hist"]

        s1, s2, p1, p2 = octaver_taps_pow2(hist, mono, e)
        del p1, p2  # gains below tile one exact period instead
        two_pi = jnp.float32(2.0 * jnp.pi)
        # The Hann crossfade gains are EXACTLY periodic on the pow-2 grid:
        # p1(n) = (n*(D-1) mod D*S)/(D*S) repeats with period D*S (e<0;
        # period S for e>0) and D-1 / R-1 are odd so gcd with the pow-2
        # modulus is 1 — the tiled values are bitwise the full-length ones
        # (same int32 residues -> same f32 quotients -> same cos).  One
        # period of cos + a tile copy replaces N transcendental evals
        # (35.5 -> 4.7 us at N=893k on v5e).
        if e < 0:
            d = 1 << (-e)
            per = d * size
            r1p = jnp.mod(jnp.arange(per, dtype=jnp.int32) * (d - 1), per)
        else:
            per = size
            r1p = jnp.mod(
                -jnp.arange(per, dtype=jnp.int32) * ((1 << e) - 1), per
            )
        r2p = jnp.mod(r1p + per // 2, per)
        pf = jnp.float32(per)
        g1p = 0.5 * (1.0 - jnp.cos(two_pi * (r1p.astype(jnp.float32) / pf)))
        g2p = 0.5 * (1.0 - jnp.cos(two_pi * (r2p.astype(jnp.float32) / pf)))
        k_tiles = -(-n // per)
        g1 = jnp.tile(g1p, k_tiles)[:n]  # octaver.py:66-67
        g2 = jnp.tile(g2p, k_tiles)[:n]
        wet = s1 * g1 + s2 * g2

        # Exact phasor advance: p(n) = mod(n * (1 - 2^e) / size, 1).
        if e < 0:
            d = 1 << (-e)
            ph = (n * (d - 1)) % (d * size) / (d * size)
        else:
            ph = (-n * ((1 << e) - 1)) % size / size
        new_state = {
            "hist": ring_push(hist, mono),
            "phasor": jnp.float32(ph),
            "comp": jnp.float32(0.0),
        }
        y = x * (1.0 - mix) + wet[None, :] * mix
        return new_state, y
