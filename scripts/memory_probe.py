"""Memory-analysis probe for the 100k fused vs unfused train step."""
import argparse
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stgcn_tpu.data.synthetic import random_road_graph
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
from stgcn_tpu.nn.model import STGCN
from stgcn_tpu.ops.graph_op import make_graph_op

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=4)
ap.add_argument("--vertices", type=int, default=100_000)
ap.add_argument("--fused", action="store_true")
ap.add_argument("--no-remat", action="store_true")
args = ap.parse_args()

v = args.vertices
adj = random_road_graph(v, k_neighbors=8, seed=0)
art = build_gso(adj, "sym_norm_lap", cheb=True)
art = dataclasses.replace(
    art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
gop = make_graph_op(art, "banded", banded_block_size=512, dtype=jnp.bfloat16)
model = STGCN(n_his=12, dtype=jnp.bfloat16, remat=not args.no_remat)
rng = np.random.default_rng(0)
b = args.batch
x = jnp.asarray(rng.standard_normal((b, 12, v, 1)), jnp.float32)
params = model.init(jax.random.PRNGKey(0), x[:1], gop,
                    deterministic=True)["params"]
tx = optax.adamw(1e-3, weight_decay=1e-3)
opt_state = tx.init(params)
key = jax.random.PRNGKey(7)

if args.fused:
    def apply_fn(p, g, xx, r):
        return fused_sparse_forward(p, xx, g, model, deterministic=False,
                                    rng=r)
else:
    def apply_fn(p, g, xx, r):
        return model.apply({"params": p}, xx, g, deterministic=False,
                           rngs={"dropout": r})

@partial(jax.jit, donate_argnums=(0, 1))
def step(p, s, g, xx, r):
    def loss(pp):
        pred = apply_fn(pp, g, xx, r)
        return jnp.mean(pred.astype(jnp.float32) ** 2)
    l, grads = jax.value_and_grad(loss)(p)
    up, s2 = tx.update(grads, s, p)
    return optax.apply_updates(p, up), s2, l

lowered = step.lower(params, opt_state, gop, x, key)
compiled = lowered.compile()
ma = compiled.memory_analysis()
print("fused" if args.fused else "unfused", "batch", b, flush=True)
for k in ("argument_size_in_bytes", "output_size_in_bytes",
          "temp_size_in_bytes", "alias_size_in_bytes",
          "generated_code_size_in_bytes"):
    print(f"  {k}: {getattr(ma, k) / 2**30:.3f} GiB")
