"""Device (JAX/XLA/Pallas) kernels of the encode pipeline."""
