"""The elementwise / epilogue op zoo.

TPU re-design of CK's element-wise operation functors
(``include/ck/tensor_operation/gpu/element/``):

  - unary  (``unary_element_wise_operation.hpp``): PassThrough:28, Scale:289,
    Relu:409, FastGelu:435, Gelu:550, Sigmoid, Silu, TanH, ...
  - binary (``binary_element_wise_operation.hpp``): Add:13, Multiply:117,
    ScaleAdd:209, Bilinear:280, AddRelu:354, AddFastGelu:461,
    MultiplyFastGelu:526, AddSilu:591
  - int8 requant (``quantization_operation.hpp:25-251``):
    Activation_Mul_Clamp, Mul_Activation_Mul_Clamp, Add_Activation_Mul_Clamp,
    Add_Mul_Activation_Mul_Clamp — acc*scale → activation → clamp-to-int8.

In CK these are template functors threaded through every kernel's A/B loads
and C/D epilogue. Here each is a plain jnp-traceable function; Pallas fuses
them into the kernel epilogue, XLA fuses them in reference paths. Since jnp
functions are compile-time composable, CK's ``combined_element_wise_operation``
machinery is unnecessary — users compose Python lambdas.

Epilogue calling convention: ``f(acc, *ds)`` where ``acc`` is the f32/i32
accumulator tile and ``ds`` are auxiliary "D" operand tiles (bias rows,
residual tiles — CK's "multiple-D" inputs, device_gemm_multiple_d.hpp:33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SQRT_2_OVER_PI = 0.7978845608028654

# ---------------------------------------------------------------- unary ----


def passthrough(x):
    return x


def scale(alpha):
    return lambda x: alpha * x


def relu(x):
    return jnp.maximum(x, 0.0)


def fast_gelu(x):
    # CK FastGelu (unary_element_wise_operation.hpp:435): tanh approximation
    # 0.5x(1+tanh(sqrt(2/pi)(x+0.044715x^3))), computed via exp2-free tanh.
    return 0.5 * x * (1.0 + jnp.tanh(SQRT_2_OVER_PI * (x + 0.044715 * x * x * x)))


def gelu(x):
    # exact erf-based Gelu (unary_element_wise_operation.hpp:550)
    return jax.nn.gelu(x, approximate=False)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def silu(x):
    return x * jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def leaky_relu(alpha=0.01):
    return lambda x: jnp.where(x >= 0, x, alpha * x)


def elu(alpha=1.0):
    return lambda x: jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def swish(beta=1.0):
    return lambda x: x * jax.nn.sigmoid(beta * x)


def softplus(x):
    return jax.nn.softplus(x)


def abs_(x):
    return jnp.abs(x)


def square(x):
    return x * x


UNARY = {
    "passthrough": passthrough,
    "relu": relu,
    "fast_gelu": fast_gelu,
    "gelu": gelu,
    "sigmoid": sigmoid,
    "silu": silu,
    "tanh": tanh,
    "hardswish": hardswish,
    "softplus": softplus,
    "abs": abs_,
    "square": square,
}

# --------------------------------------------------------------- binary ----
# CK binary CDE ops: f(acc, d0[, d1]) with broadcasting on the D operands.


def add(acc, d0):
    return acc + d0


def multiply(acc, d0):
    return acc * d0


def scale_add(alpha):
    # CK ScaleAdd (binary_element_wise_operation.hpp:209): alpha*acc + d0
    return lambda acc, d0: alpha * acc + d0


def bilinear(alpha, beta):
    # CK Bilinear (:280): alpha*acc + beta*d0
    return lambda acc, d0: alpha * acc + beta * d0


def add_relu(acc, d0):
    return relu(acc + d0)


def add_silu(acc, d0):
    return silu(acc + d0)


def add_fast_gelu(acc, d0):
    return fast_gelu(acc + d0)


def multiply_fast_gelu(acc, d0):
    return fast_gelu(acc * d0)


def add_multiply(acc, d0, d1):
    return (acc + d0) * d1


def multiply_add(acc, d0, d1):
    return acc * d0 + d1


def add_add_fast_gelu(acc, d0, d1):
    # CK AddAddFastGelu — the canonical fused-epilogue demo
    # (example/04_gemm_add_add_fastgelu)
    return fast_gelu(acc + d0 + d1)


def multiply_multiply(acc, d0, d1):
    # CK MultiplyMultiply — used by the fp8 ab-scale GEMMs
    # (example/65_gemm_multiply_multiply)
    return acc * d0 * d1


def add_multiply_multiply(acc, d0, d1, d2):
    return (acc + d0) * d1 * d2


BINARY = {
    "add": add,
    "multiply": multiply,
    "add_relu": add_relu,
    "add_silu": add_silu,
    "add_fast_gelu": add_fast_gelu,
    "multiply_fast_gelu": multiply_fast_gelu,
    "add_add_fast_gelu": add_add_fast_gelu,
    "multiply_multiply": multiply_multiply,
    "add_multiply": add_multiply,
    "multiply_add": multiply_add,
}

# ------------------------------------------------------- int8 requant ------
# CK quantization_operation.hpp:25-251. acc is the int32 accumulator tile
# (cast to f32 for the scale multiply), output is clamped int8.


def _clamp_i8(x):
    return jnp.clip(jnp.round(x), -128, 127)


def activation_mul_clamp(activation, requant_scale):
    """CK Activation_Mul_Clamp: y = clamp(scale * act(acc))."""
    return lambda acc: _clamp_i8(requant_scale * activation(acc.astype(jnp.float32)))


def mul_activation_mul_clamp(activation, scale_gemm, scale_requant):
    """CK Mul_Activation_Mul_Clamp: y = clamp(s2 * act(s1 * acc)).

    Used when the activation is not scale-invariant (gelu, sigmoid, ...)."""
    return lambda acc: _clamp_i8(
        scale_requant * activation(scale_gemm * acc.astype(jnp.float32))
    )


def add_activation_mul_clamp(activation, requant_scale):
    """CK Add_Activation_Mul_Clamp: y = clamp(scale * act(acc + bias))."""
    return lambda acc, bias: _clamp_i8(
        requant_scale * activation(acc.astype(jnp.float32) + bias.astype(jnp.float32))
    )


def add_mul_activation_mul_clamp(activation, scale_gemm, scale_requant):
    """CK Add_Mul_Activation_Mul_Clamp: y = clamp(s2 * act(s1*(acc + bias)))."""
    return lambda acc, bias: _clamp_i8(
        scale_requant
        * activation(scale_gemm * (acc.astype(jnp.float32) + bias.astype(jnp.float32)))
    )


def add_add_mul_activation_mul_clamp(activation, scale_gemm, scale_requant):
    """Two-D requant: y = clamp(s2 * act(s1 * (acc + d0 + d1))).

    The int8 analog of the bf16 add_add_fastgelu fusion (CK
    ``device_gemm_multiple_d`` AddAddFastGelu,
    ``element/binary_element_wise_operation.hpp:461``) composed with the
    requant tail of ``Add_Mul_Activation_Mul_Clamp``
    (``quantization_operation.hpp:207``): bias + residual enter the int32
    accumulator before the scale/activation/clamp chain.
    """
    return lambda acc, d0, d1: _clamp_i8(
        scale_requant
        * activation(
            scale_gemm
            * (
                acc.astype(jnp.float32)
                + d0.astype(jnp.float32)
                + d1.astype(jnp.float32)
            )
        )
    )
