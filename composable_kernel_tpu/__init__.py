"""composable_kernel_tpu — a TPU-native quantized-inference kernel framework.

A from-scratch JAX/Pallas re-design of the capabilities of AMD's Composable
Kernel library (reference: mtgu0705/composable_kernel): low-bit GEMMs
(fp16/bf16 activations x int4/int8 weights with per-channel and group-wise
scales), int8 activation-quant GEMM with requant epilogues, a fused epilogue
zoo, flash attention with INT8 KV-cache, normalization/reduction/softmax ops,
an instance registry + autotuner replacing CK's template-instance libraries,
and multi-device tensor/data parallelism via jax.sharding (a capability the
single-GPU reference never had).

Layering (TPU-native analog of CK's 4 layers, SURVEY.md section 1):
  - ``reference/``  : pure-jnp golden implementations (CK's host reference ops)
  - ``ops/``        : Pallas kernels + XLA ops (CK's gridwise/device-op layers)
  - ``tuning/``     : config registry + autotuner (CK's instance libraries +
                      ckProfiler)
  - ``parallel/``   : mesh/sharding utilities (new; reference is single-GPU)
  - ``models/``     : model graphs built on ops/ (Llama W4A16 flagship)
  - ``runtime/``    : serving engine — KV cache, sampling, batching
"""

__version__ = "0.1.0"

from composable_kernel_tpu import dtypes  # noqa: F401
