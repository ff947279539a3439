"""Parameter initializers matching the reference PyTorch distributions.

The reference initializes every learnable tensor with
``kaiming_uniform_(a=√5)`` and biases with ``U(±1/√fan_in)``
(``model/layers.py:136-141,187-192`` and the torch defaults inside
``nn.Conv2d`` / ``nn.Linear``). With ``a=√5`` the kaiming bound collapses to
``1/√fan_in``, so everything is ``U(±1/√fan_in)`` — but *fan_in follows
torch's tensor-shape convention*, which has quirks we reproduce exactly:

- conv kernels (HWIO here): ``fan_in = kh·kw·c_in``
- linear kernels ``[in, out]``: ``fan_in = in``
- Cheb weight ``[Ks, c_in, c_out]``: torch treats dim0 as output maps,
  dim1 as input maps, the rest as receptive field ⇒ ``fan_in = c_in·c_out``
- GraphConv weight ``[c_in, c_out]`` (2-D): torch fan_in is ``size(1)``
  ⇒ ``fan_in = c_out`` (not ``c_in``!)
"""

from __future__ import annotations

import jax


def uniform_fan(fan_in: int):
    """U(±1/√fan_in) initializer."""
    bound = (1.0 / fan_in) ** 0.5 if fan_in > 0 else 0.0

    def init(key, shape, dtype=jax.numpy.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def conv_kernel_init(key, shape, dtype=jax.numpy.float32):
    """HWIO conv kernel: fan_in = kh*kw*c_in."""
    kh, kw, c_in, _ = shape
    return uniform_fan(kh * kw * c_in)(key, shape, dtype)


def conv_bias_init(c_in: int, kh: int, kw: int = 1):
    return uniform_fan(kh * kw * c_in)


def dense_kernel_init(key, shape, dtype=jax.numpy.float32):
    """[in, out] linear kernel: fan_in = in."""
    return uniform_fan(shape[0])(key, shape, dtype)


def dense_bias_init(fan_in: int):
    return uniform_fan(fan_in)


def torch_fan_in(shape: tuple[int, ...]) -> int:
    """torch ``_calculate_fan_in_and_fan_out`` on a raw torch-shaped tensor."""
    if len(shape) < 2:
        raise ValueError("fan_in undefined for <2-D tensors")
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    return shape[1] * receptive
