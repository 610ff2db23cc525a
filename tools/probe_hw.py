#!/usr/bin/env python
"""Probe the real chip: matmul peak, gather costs, loop overhead."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import jax, jax.numpy as jnp, numpy as np

def timeit(f, *a, iters=10):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters

d = jax.devices()[0]
print("device:", d.device_kind, d.platform)

# matmul peak bf16 and f32
for dt, n in [(jnp.bfloat16, 4096), (jnp.float32, 4096)]:
    a = jnp.ones((n, n), dt); b = jnp.ones((n, n), dt)
    f = jax.jit(lambda a, b: a @ b)
    dtm = timeit(f, a, b)
    print(f"matmul {n} {dt.__name__}: {2*n**3/dtm/1e12:.1f} TFLOP/s  ({dtm*1e3:.2f} ms)")

# elementwise vector throughput (8 fused ops on 64MB)
x = jnp.ones((16*1024*1024,), jnp.float32)
f = jax.jit(lambda x: jnp.minimum(jnp.maximum(x*1.1+0.3, x*0.7), x*0.9+2.0)*x)
dtm = timeit(f, x)
print(f"elementwise 16M f32 ~6ops: {16e6*6/dtm/1e12:.2f} Tflop/s ({dtm*1e3:.3f} ms)")

# dispatch overhead: trivial jit
f = jax.jit(lambda x: x + 1.0)
s = jnp.zeros((8, 128))
dtm = timeit(f, s, iters=100)
print(f"dispatch trivial jit: {dtm*1e6:.0f} us")

# gather: 65536 random indices from (24415, 8) f32 table
rng = np.random.default_rng(0)
tbl = jnp.asarray(rng.normal(size=(24415, 8)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, 24415, 65536).astype(np.int32))
f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
dtm = timeit(f, tbl, idx)
print(f"gather 65k rows from (24k,8): {dtm*1e3:.3f} ms -> {65536/dtm/1e6:.1f} Mrow/s")

# gather from small table (64, 8)
tbl2 = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
idx2 = jnp.asarray(rng.integers(0, 64, 65536).astype(np.int32))
dtm = timeit(f, tbl2, idx2)
print(f"gather 65k rows from (64,8): {dtm*1e3:.3f} ms")

# one-hot matmul gather from (64,8)
f2 = jax.jit(lambda t, i: jax.nn.one_hot(i, 64, dtype=jnp.float32) @ t)
dtm = timeit(f2, tbl2, idx2)
print(f"one-hot matmul gather (64,8): {dtm*1e3:.3f} ms")

# one-hot matmul gather from (1024,8)
tbl3 = jnp.asarray(rng.normal(size=(1024, 8)).astype(np.float32))
idx3 = jnp.asarray(rng.integers(0, 1024, 65536).astype(np.int32))
f3 = jax.jit(lambda t, i: jax.nn.one_hot(i, 1024, dtype=jnp.bfloat16) @ t.astype(jnp.bfloat16))
dtm = timeit(f3, tbl3, idx3)
print(f"one-hot bf16 matmul gather (1024,8): {dtm*1e3:.3f} ms")

# sort 65k f32
x = jnp.asarray(rng.normal(size=(65536,)).astype(np.float32))
f = jax.jit(jnp.sort)
dtm = timeit(f, x)
print(f"sort 65k f32: {dtm*1e3:.3f} ms")

# argsort 65k
f = jax.jit(jnp.argsort)
dtm = timeit(f, x)
print(f"argsort 65k f32: {dtm*1e3:.3f} ms")

# while_loop scalar iteration cost (1000 iters, tiny state)
def wl(x):
    def body(c):
        i, v = c
        return i + 1, v * 1.000001 + 1e-7
    return jax.lax.while_loop(lambda c: c[0] < 1000, body, (0, x))[1]
f = jax.jit(wl)
s = jnp.zeros((8, 128))
dtm = timeit(f, s)
print(f"while_loop 1000 iters (8,128) state: {dtm*1e6:.0f} us -> {dtm*1e3:.3f} us/iter... total ms={dtm*1e3:.3f}")

# dense ray x box slab test: (8192 rays) x (1024 boxes)
R, M = 8192, 1024
o = jnp.asarray(rng.normal(size=(R,3)).astype(np.float32))
inv = jnp.asarray(rng.normal(size=(R,3)).astype(np.float32))
bmin = jnp.asarray(rng.normal(size=(M,3)).astype(np.float32))
bmax = bmin + 1.0
def slab(o, inv, bmin, bmax):
    t0 = (bmin[None,:,:] - o[:,None,:]) * inv[:,None,:]
    t1 = (bmax[None,:,:] - o[:,None,:]) * inv[:,None,:]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return tn <= tf
f = jax.jit(slab)
dtm = timeit(f, o, inv, bmin, bmax)
print(f"dense slab {R}x{M}: {dtm*1e3:.3f} ms -> {R*M/dtm/1e9:.2f} Gtest/s")
EOF_MARKER = None
