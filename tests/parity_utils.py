"""Shared torch->flax weight-transfer helpers for parity tests."""

import jax.numpy as jnp
import numpy as _np


def _j(x):
    """torch-tensor/ndarray -> jnp array with an explicit copy.

    ``jnp.asarray`` may zero-copy alias numpy memory on CPU; a torch
    ``.numpy()`` view would then be mutated by in-place optimizer steps,
    corrupting the transferred parameters.
    """
    return jnp.array(_np.array(x, copy=True))


def conv2d_params(mod):
    w = mod.weight.detach().numpy()  # [c_out, c_in, kh, kw]
    p = {"kernel": _j(w.transpose(2, 3, 1, 0))}
    if mod.bias is not None:
        p["bias"] = _j(mod.bias.detach().numpy())
    return p


def dense_params(mod):
    p = {"kernel": _j(mod.weight.detach().numpy().T)}
    if mod.bias is not None:
        p["bias"] = _j(mod.bias.detach().numpy())
    return p


def align_params(ref_align, c_in, c_out):
    if c_in > c_out:
        w = ref_align.align_conv.weight.detach().numpy()[:, :, 0, 0]  # [out,in]
        return {"align_conv": {"kernel": _j(w.T),
                               "bias": _j(ref_align.align_conv.bias.detach().numpy())}}
    return {}


def temporal_params(ref, c_in, c_out):
    return {"align": align_params(ref.align, c_in, c_out),
            "causal_conv": conv2d_params(ref.causal_conv)}


def cheb_params(ref):
    p = {"weight": _j(ref.weight.detach().numpy())}
    if ref.bias is not None:
        p["bias"] = _j(ref.bias.detach().numpy())
    return p


def gcl_params(ref, c_in, c_out):
    p = {"align": align_params(ref.align, c_in, c_out)}
    if hasattr(ref, "cheb_graph_conv"):
        p["cheb_graph_conv"] = cheb_params(ref.cheb_graph_conv)
    else:
        p["graph_conv"] = cheb_params(ref.graph_conv)
    return p


def ln_params(ref_ln):
    return {"scale": _j(ref_ln.weight.detach().numpy()),
            "bias": _j(ref_ln.bias.detach().numpy())}


def stblock_params(ref, last_c, channels):
    return {
        "tmp_conv1": temporal_params(ref.tmp_conv1, last_c, channels[0]),
        "graph_conv": gcl_params(ref.graph_conv, channels[0], channels[1]),
        "tmp_conv2": temporal_params(ref.tmp_conv2, channels[1], channels[2]),
        "ln": ln_params(ref.tc2_ln),
    }


def output_params(ref, last_c, channels):
    return {
        "tmp_conv1": temporal_params(ref.tmp_conv1, last_c, channels[0]),
        "ln": ln_params(ref.tc1_ln),
        "fc1": dense_params(ref.fc1),
        "fc2": dense_params(ref.fc2),
    }


