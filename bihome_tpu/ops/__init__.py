"""TPU compute ops: color conversions, fused kernels."""
