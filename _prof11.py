"""Gather replacement candidates, calibrated at the DP's real sizes."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

def timeit(name, f, *args):
    out = f(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args)
        _ = jax.tree.leaves(out)[0].sum().item()
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(ts)*1e3:8.1f} ms", flush=True)

N = 2508800
R, C = 737, 859
key = jax.random.PRNGKey(0)
iy = jax.random.randint(key, (N,), 0, R)
jx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, C)
flat = iy * C + jx
tab8 = jnp.zeros((R * C,), jnp.int8)

timeit("baseline flat s8 gather", jax.jit(lambda t, i: (t[i] > 0).sum()), tab8, flat)

# sorted/unique flags via lax.gather
import jax.lax as lax
def g_flags(t, i):
    out = lax.gather(t, i[:, None],
                     lax.GatherDimensionNumbers(offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,)),
                     (1,), indices_are_sorted=True, unique_indices=False,
                     mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return (out > 0).sum()
timeit("flat s8 gather, indices_are_sorted", jax.jit(g_flags), tab8, flat)

# MXU one-hot row-select rate: [N,R] bf16 @ [R,64]
K64 = 64
rowtab = jnp.zeros((R, K64), jnp.bfloat16)
def onehot_mm(rt, iyv):
    oh = (iyv[:, None] == jnp.arange(R)[None, :]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(oh, rt, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.sum()
timeit("one-hot [N,737]@[737,64] bf16 MXU", jax.jit(onehot_mm), rowtab, iy)

# chunked variant to bound memory (N x R one-hot is 2.5M x 737 bf16 = 3.7GB!)
def onehot_mm_chunk(rt, iyv):
    def body(c):
        oh = (c[:, None] == jnp.arange(R)[None, :]).astype(jnp.bfloat16)
        return jax.lax.dot_general(oh, rt, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32).sum()
    return jax.lax.map(body, iyv.reshape(64, -1)).sum()
timeit("one-hot MXU chunked(64)", jax.jit(onehot_mm_chunk), rowtab, iy)
