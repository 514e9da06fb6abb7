from soccerdiffusion_tpu.utils.geometry import (
    quats_to_5d,
    shift_radian_to_positive_range,
    wxyz2xyzw,
    xyzw2wxyz,
)

__all__ = ["quats_to_5d", "shift_radian_to_positive_range", "xyzw2wxyz", "wxyz2xyzw"]
