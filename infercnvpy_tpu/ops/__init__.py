"""TPU compute ops (JAX/XLA/Pallas): smoothing kernel, linear algebra, graphs."""
