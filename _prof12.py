"""Row-gather + lane-select variants."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

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
T = R * C
key = jax.random.PRNGKey(0)
flat = jax.random.randint(key, (N,), 0, T)
tab8 = jnp.zeros((T,), jnp.int8)

# pad table to rows of 128
RR = -(-T // 128)
tabrows8 = jnp.zeros((RR, 128), jnp.int8)
tabrows32 = jnp.zeros((RR, 128), jnp.int32)

def rowsel8(t, i):
    row = i >> 7
    lane = (i & 127).astype(jnp.int32)
    rows = t[row]                       # [N,128] row gather
    hit = (rows > 0) & (lane[:, None] == jnp.arange(128)[None, :])
    return hit.any(axis=1).sum()
timeit("row-gather s8 [N,128] + lane onehot", jax.jit(rowsel8), tabrows8, flat)

# pack 128 cells per int32x4? -> row of 32 int32 covering 128 bytes
def rowsel32(t, i):
    row = i >> 7
    lane = (i & 127).astype(jnp.int32)
    rows = t[row]
    hit = (rows > 0) & (lane[:, None] == jnp.arange(128)[None, :])
    return hit.any(axis=1).sum()
timeit("row-gather s32 [N,128] + lane onehot", jax.jit(rowsel32), tabrows32, flat)

# BITPACK: 128 cells -> 4 x int32 words; gather [N,4] then bit test
RB = -(-T // 128)
tabbits = jnp.zeros((RB, 4), jnp.uint32)
def bitsel(t, i):
    row = i >> 7
    rem = (i & 127).astype(jnp.uint32)
    words = t[row]                       # [N,4]
    word = rem >> 5                      # which of 4 words
    bit = rem & 31
    w = jnp.where(word[:, None] == jnp.arange(4)[None, :].astype(jnp.uint32),
                  words, 0).sum(axis=1, dtype=jnp.uint32)
    return ((w >> bit) & 1).sum()
timeit("bitpack rows [N,4]u32 + bit test", jax.jit(bitsel), tabbits, flat)

# bitpack 1 word per probe: 32 cells/word -> row dim T/32
RW = -(-T // 32)
tabw = jnp.zeros((RW,), jnp.uint32)
def onewordsel(t, i):
    w = t[i >> 5]                        # [N] u32 gather (same count!)
    return ((w >> (i & 31).astype(jnp.uint32)) & 1).sum()
timeit("bitpack flat u32 gather (same N)", jax.jit(onewordsel), tabw, flat)
