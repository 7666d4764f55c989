"""Per-document scalar kernels (run batched inside Arrow UDFs)."""
