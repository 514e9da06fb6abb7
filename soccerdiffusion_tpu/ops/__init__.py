"""TPU kernels and fused ops (Pallas) with XLA fallbacks."""
