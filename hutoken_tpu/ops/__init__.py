"""Device kernels (jnp/XLA and Pallas) for the tokenization hot paths."""
