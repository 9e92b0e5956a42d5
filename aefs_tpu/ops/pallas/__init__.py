from aefs_tpu.ops.pallas.resample import catmull_rom_resample

__all__ = ["catmull_rom_resample"]
