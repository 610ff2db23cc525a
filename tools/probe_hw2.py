#!/usr/bin/env python
"""Probe v2: chain iterations so each dispatch depends on the previous."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import jax, jax.numpy as jnp, numpy as np

def timeit_chain(f, x0, iters=10):
    x = f(x0); jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters

rng = np.random.default_rng(0)

# matmul chained: x <- normalize(x @ w)
n = 4096
w = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32) / n**0.5)
wb = w.astype(jnp.bfloat16)
f32 = jax.jit(lambda x: (x @ w) * 0.999)
fb = jax.jit(lambda x: (x @ wb) * jnp.bfloat16(0.999))
x0 = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
dt = timeit_chain(f32, x0)
print(f"matmul f32 chained {n}: {2*n**3/dt/1e12:.1f} TFLOP/s ({dt*1e3:.3f} ms)")
dt = timeit_chain(fb, x0.astype(jnp.bfloat16))
print(f"matmul bf16 chained {n}: {2*n**3/dt/1e12:.1f} TFLOP/s ({dt*1e3:.3f} ms)")

# elementwise chained on 16M f32 (memory bound: 2x64MB traffic/iter)
x = jnp.asarray(rng.normal(size=(16*1024*1024,)).astype(np.float32))
f = jax.jit(lambda x: x * 1.0000001 + 1e-9)
dt = timeit_chain(f, x, iters=20)
print(f"elementwise 16M: {dt*1e3:.3f} ms -> HBM BW ~{2*64/1024/dt:.0f} GB/s")

# gather chained: idx depends on prev output
tbl = jnp.asarray(rng.normal(size=(24415, 8)).astype(np.float32))
def g(idx):
    rows = jnp.take(tbl, idx, axis=0)
    return (idx + jnp.abs(rows[:, 0]).astype(jnp.int32) + 1) % 24415
f = jax.jit(g)
idx0 = jnp.asarray(rng.integers(0, 24415, 65536).astype(np.int32))
dt = timeit_chain(f, idx0, iters=20)
print(f"gather 65k rows (24k,8) chained: {dt*1e3:.3f} ms -> {65536/dt/1e6:.1f} Mrow/s")

# same but 1M indices
idx0 = jnp.asarray(rng.integers(0, 24415, 1<<20).astype(np.int32))
dt = timeit_chain(f, idx0, iters=20)
print(f"gather 1M rows (24k,8) chained: {dt*1e3:.3f} ms -> {(1<<20)/dt/1e6:.1f} Mrow/s")

# while_loop with gather inside (the traversal inner-loop shape):
# 200 iterations x (gather 65k node rows + slab math)
meta = jnp.asarray(rng.integers(0, 24415, (24415, 3)).astype(np.int32))
bounds = jnp.asarray(rng.normal(size=(24415, 6)).astype(np.float32))
def walk(idx):
    o = jnp.zeros((idx.shape[0], 3))
    inv = jnp.ones((idx.shape[0], 3))
    def body(c):
        i, idx = c
        box = jnp.take(bounds, idx, axis=0)
        m = jnp.take(meta, idx, axis=0)
        t0 = (box[:, 0:3] - o) * inv
        t1 = (box[:, 3:6] - o) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        nxt = jnp.where(tn <= tf, m[:, 2], m[:, 0])
        return i + 1, nxt % 24415
    return jax.lax.while_loop(lambda c: c[0] < 200, body, (0, idx))[1]
f = jax.jit(walk)
idx0 = jnp.asarray(rng.integers(0, 24415, 65536).astype(np.int32))
dt = timeit_chain(f, idx0, iters=3)
print(f"while 200x(2 gathers 65k + slab): {dt*1e3:.3f} ms -> {dt/200*1e6:.1f} us/iter")

# dense slab chained
R, M = 8192, 1024
bmin = jnp.asarray(rng.normal(size=(M,3)).astype(np.float32))
bmax = bmin + 1.0
def slab(o):
    t0 = (bmin[None,:,:] - o[:,None,:]) * 1.3
    t1 = (bmax[None,:,:] - o[:,None,:]) * 1.3
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return o + 1e-6 * jnp.sum(tn <= tf, axis=-1, dtype=jnp.float32)[:, None]
f = jax.jit(slab)
o0 = jnp.asarray(rng.normal(size=(R,3)).astype(np.float32))
dt = timeit_chain(f, o0, iters=10)
print(f"dense slab {R}x{M} chained: {dt*1e3:.3f} ms -> {R*M/dt/1e9:.2f} Gtest/s")
