from aefs_tpu.core.params import ParamSpec, smooth_step
from aefs_tpu.core.chain import Chain, build_chain

__all__ = ["ParamSpec", "smooth_step", "Chain", "build_chain"]
