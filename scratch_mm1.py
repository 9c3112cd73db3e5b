"""TPU verification for EventfulBlock.fuse_matmul_1 (uncommitted scratch).

Parity: eventful backbone step with fuse_matmul_1 ON vs OFF on the real
TPU at the ViTDet global-block shape (N=4096, pool 2 -> Np=1024).
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from eventful_transformer_tpu.core.blocks import EventfulBlock
from eventful_transformer_tpu.core.counting import Ctx
from eventful_transformer_tpu.core.gating import TokenGate
from eventful_transformer_tpu.core.policies import TokenNormTopK

SIZE = int(__import__("sys").argv[1]) if len(__import__("sys").argv) > 1 else 1024
hw = SIZE // 16
N = hw * hw
B, C, K = 1, 768, 256

blk = EventfulBlock(
    dim=C, heads=12, mlp_ratio=4,
    relative_embedding_size=[64, 64], window_size=None,
    input_size=(hw, hw), pool_size=2, matmul_2_cast="bfloat16",
)
for g in blk.modules_of_type(TokenGate):
    g.policy = TokenNormTopK(k=K)

params = blk.init(jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32)).astype(jnp.bfloat16)
x1 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32)).astype(jnp.bfloat16) * 0.1 + x0


def run(fuse):
    blk.fuse_matmul_1 = fuse
    st = blk.init_state(B, N, jnp.bfloat16)

    @jax.jit
    def flush(p, s, x):
        y, s = blk.apply(Ctx(), p, s, x, mode="flush")
        return y, s

    @jax.jit
    def inc(p, s, x):
        y, s = blk.apply(Ctx(), p, s, x, mode="incremental")
        return y, s

    y0, st = flush(params, st, x0)
    y1, st = inc(params, st, x1)
    return np.asarray(y0, np.float32), np.asarray(y1, np.float32)


a0, a1 = run(False)
b0, b1 = run(True)
print("flush  max|d|", np.abs(a0 - b0).max(), "rel", np.abs(a0 - b0).max() / (np.abs(a0).max() + 1e-9))
print("incr   max|d|", np.abs(a1 - b1).max(), "rel", np.abs(a1 - b1).max() / (np.abs(a1).max() + 1e-9))
