"""Effect model registry.

Mirrors the reference's type->class factory map (engine.py:50-55) plus the
two build-specific additions (waveshaper, convreverb — BASELINE.md
configs 3-4).
"""

from aefs_tpu.models.base import EffectModel
from aefs_tpu.models.biquad import BiquadFilter
from aefs_tpu.models.bitcrusher import Bitcrusher
from aefs_tpu.models.chorus import Chorus
from aefs_tpu.models.compressor import Compressor
from aefs_tpu.models.delay import StereoDelay
from aefs_tpu.models.flanger import Flanger
from aefs_tpu.models.gate import NoiseGate
from aefs_tpu.models.limiter import Limiter
from aefs_tpu.models.octaver import Octaver
from aefs_tpu.models.phaser import Phaser
from aefs_tpu.models.reverb import Reverb
from aefs_tpu.models.ringmod import RingMod
from aefs_tpu.models.spectral import SpectralFilter
from aefs_tpu.models.stereowidth import StereoWidth
from aefs_tpu.models.tremolo import Tremolo
from aefs_tpu.models.wah import Wah
from aefs_tpu.models.waveshaper import Waveshaper
from aefs_tpu.models.convreverb import ConvReverb, synthetic_ir
from aefs_tpu.models.parallel_chain import ParallelChains

EFFECT_REGISTRY = {
    "delay": StereoDelay,
    "reverb": Reverb,
    "gate": NoiseGate,
    "compressor": Compressor,
    "limiter": Limiter,
    "chorus": Chorus,
    "flanger": Flanger,
    "tremolo": Tremolo,
    "phaser": Phaser,
    "ringmod": RingMod,
    "bitcrusher": Bitcrusher,
    "wah": Wah,
    "stereowidth": StereoWidth,
    "spectral": SpectralFilter,
    "octaver": Octaver,
    "filter": BiquadFilter,
    "waveshaper": Waveshaper,
    "convreverb": ConvReverb,
    "parallel": ParallelChains,
}

__all__ = [
    "EffectModel",
    "BiquadFilter",
    "Bitcrusher",
    "Chorus",
    "Compressor",
    "StereoDelay",
    "Flanger",
    "Limiter",
    "NoiseGate",
    "Octaver",
    "Phaser",
    "Reverb",
    "RingMod",
    "SpectralFilter",
    "StereoWidth",
    "Tremolo",
    "Wah",
    "Waveshaper",
    "ConvReverb",
    "synthetic_ir",
    "EFFECT_REGISTRY",
]
