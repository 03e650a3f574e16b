"""Device-op layer: Pallas kernels and XLA ops (CK's gridwise/device layers)."""
