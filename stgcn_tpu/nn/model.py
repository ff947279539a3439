"""STGCN model family (`model/models.py:6-103`).

One class covers both reference variants — the Cheb/1st-order split is a
config field, mirroring the fact that the two reference classes are
structurally identical twins (dispatch happens inside STConvBlock either
way, `models.py:32,82`).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stgcn_tpu.nn import init as tinit
from stgcn_tpu.nn import layers as L


def compute_ko(n_his: int, kt: int, stblock_num: int) -> int:
    """Remaining time steps after the ST blocks (`main.py:80`)."""
    return n_his - (kt - 1) * 2 * stblock_num


def build_blocks(stblock_num: int, ko: int) -> list[list[int]]:
    """Bottleneck channel plan (`main.py:84-92`):
    ``[[1]] + N×[[64,16,64]] + ([128,128] if Ko>0 else [128]) + [[1]]``."""
    blocks: list[list[int]] = [[1]]
    for _ in range(stblock_num):
        blocks.append([64, 16, 64])
    if ko == 0:
        blocks.append([128])
    elif ko > 0:
        blocks.append([128, 128])
    else:
        raise ValueError(f"invalid config: Ko = {ko} < 0 "
                         "(n_his too small for Kt/stblock_num)")
    blocks.append([1])
    return blocks


class STGCN(nn.Module):
    """Spatio-temporal GCN: ``stblock_num`` × STConvBlock + output head.

    Input  ``[B, n_his, V, 1]`` (channels-last), output ``[B, T_out, V, 1]``
    with ``T_out = 1`` for every valid config (callers flatten to ``[B, V]``,
    like the reference's ``.view(len(x), -1)``, `main.py:166`).

    The GSO flows in as a call argument (a :class:`~stgcn_tpu.ops.GraphOp`),
    so one set of weights works with dense, block-sparse, or mesh-sharded
    graph operators.
    """

    n_his: int
    kt: int = 3
    ks: int = 3
    blocks: Sequence[Sequence[int]] | None = None
    stblock_num: int = 2
    act_func: str = "glu"
    graph_conv_type: str = "cheb_graph_conv"
    use_bias: bool = True
    droprate: float = 0.5
    dtype: Any = None  # compute dtype (bf16 mixed precision); params stay f32
    # per-vertex LN affine param dtype: bf16 halves 99.9% of the params
    # at 1M vertices (2.06 -> 1.03 GB + matching optimizer-state savings);
    # parity/default mode keeps f32
    ln_param_dtype: Any = jnp.float32
    remat: bool = False  # jax.checkpoint each ST block: recompute its
                         # activations in the backward instead of storing
                         # them — required at 100k+ vertices where one
                         # [B, T, V, 128] activation is gigabytes

    def _plan(self) -> tuple[list[list[int]], int]:
        ko = compute_ko(self.n_his, self.kt, self.stblock_num)
        blocks = [list(b) for b in self.blocks] if self.blocks is not None \
            else build_blocks(self.stblock_num, ko)
        return blocks, ko

    @nn.compact
    def __call__(self, x: jax.Array, gop: Any, *, deterministic: bool = True) -> jax.Array:
        blocks, ko = self._plan()
        if ko < 0:
            raise ValueError(f"invalid config: Ko = {ko} < 0")
        if ko == 1:
            # The reference silently returns the st-block output unchanged
            # here (`models.py:44-53` has no Ko==1 branch) — that is a latent
            # bug, not a capability; we reject the config loudly.
            raise ValueError("Ko == 1 is not a valid STGCN config "
                             "(no output head can consume a single step)")

        block_cls = L.STConvBlock
        if self.remat:
            # save the graph-aggregation outputs (the expensive SpMM/pair,
            # ~10 ms at 100k training widths) instead of replaying them;
            # everything else in the block is recomputed as before
            block_cls = nn.remat(
                L.STConvBlock, static_argnums=(3,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "stgcn_graph_term"))
        for l in range(len(blocks) - 3):
            x = block_cls(
                kt=self.kt, ks=self.ks, channels=tuple(blocks[l + 1]),
                act_func=self.act_func, graph_conv_type=self.graph_conv_type,
                use_bias=self.use_bias, droprate=self.droprate,
                dtype=self.dtype, ln_param_dtype=self.ln_param_dtype,
                name=f"st_block_{l}",
            )(x, gop, deterministic)

        if ko > 1:
            x = L.OutputBlock(
                ko=ko, channels=tuple(blocks[-2]), end_channel=blocks[-1][0],
                act_func=self.act_func, use_bias=self.use_bias,
                droprate=self.droprate, dtype=self.dtype,
                ln_param_dtype=self.ln_param_dtype, name="output",
            )(x, deterministic=deterministic)
        else:  # ko == 0 — fc head (`models.py:38-42,48-51`; dropout defined
            # there but never applied in forward — mirrored here)
            x = nn.Dense(blocks[-2][0], use_bias=self.use_bias,
                         kernel_init=tinit.dense_kernel_init,
                         bias_init=tinit.dense_bias_init(blocks[-3][-1]),
                         name="fc1")(x)
            x = jax.nn.relu(x)
            x = nn.Dense(blocks[-1][0], use_bias=self.use_bias,
                         kernel_init=tinit.dense_kernel_init,
                         bias_init=tinit.dense_bias_init(blocks[-2][0]),
                         name="fc2")(x)
        return x.astype(jnp.float32)
