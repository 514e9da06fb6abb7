"""Native (C++) components, loaded via ctypes.

``framepack`` is the input-pipeline hot path: a multithreaded window
assembler over flat packed arrays (the native counterpart of the reference's
32 DataLoader worker processes; reference train.py:94-104). The shared
library is compiled on first use with g++ and cached next to the source.
"""

from soccerdiffusion_tpu.native.build import load_framepack, native_available

__all__ = ["load_framepack", "native_available"]
