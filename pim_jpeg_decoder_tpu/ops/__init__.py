"""TPU compute kernels (Pallas) and the shared fixed-point decode spec."""
