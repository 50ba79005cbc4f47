"""TPU kernels (Pallas) for the hot paths, with jnp fallbacks."""
