"""BPM-sync helper (wishlist todo:2)."""

import pytest

from aefs_tpu.utils.tempo import delay_ms_for


def test_quarter_note_at_120():
    assert delay_ms_for(120) == 500.0


def test_divisions():
    assert delay_ms_for(120, "1/8") == 250.0
    assert delay_ms_for(120, "1/4.") == 750.0
    assert abs(delay_ms_for(120, "1/4T") - 1000.0 / 3.0) < 1e-9
    assert delay_ms_for(60, 1.0) == 1000.0


def test_invalid_bpm():
    with pytest.raises(ValueError):
        delay_ms_for(0)


def test_lfo_rate():
    from aefs_tpu.utils.tempo import lfo_rate_hz_for

    assert lfo_rate_hz_for(120) == 2.0          # one cycle per quarter
    assert lfo_rate_hz_for(120, "1/2") == 1.0   # per half note
    assert abs(lfo_rate_hz_for(90, "1/8") - 3.0) < 1e-12
