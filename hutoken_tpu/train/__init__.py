"""BPE vocabulary training (host-exact and TPU-distributed paths)."""
