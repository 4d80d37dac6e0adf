#!/usr/bin/env python
"""On-chip micro-probe: texel-gather strategies for per-pixel texturing.

The UV path's cost is (B*H*W)-row gathers (measured ~95 ms each at
B=128 @224^2 in script/probe_uv.py). Candidates:

  rows3    - current: gather rows of 3 f32 from a (M, 3) table
  packed   - gather scalars from a (M,) f32 table (rgb888 packed)
  row128   - gather 128-lane rows from (M/128, 128) + one-hot lane
             reduce (fusable; gathers are DMA-shaped, selects on VPU)
  row128x2 - two row gathers + weighted lane masks (bilinear shape)

Prints one JSON line per strategy.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DISPATCH_FLOOR = 0.028
B, H, W = 128, 224, 224
N = B * H * W
M = 24 * 128 * 128  # 24 pages of 128^2 texels


def timed(fn, args_list):
    out = fn(*args_list[0])
    float(jnp.ravel(out)[0])
    t0 = time.time()
    for a in args_list[1:]:
        out = fn(*a)
        float(jnp.ravel(out)[0])
    return (time.time() - t0) / (len(args_list) - 1) - DISPATCH_FLOOR


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    table3 = jnp.asarray(rng.rand(M, 3).astype(np.float32))
    table1 = jnp.asarray(rng.rand(M).astype(np.float32))
    rows = jnp.asarray(rng.rand(M // 128, 128).astype(np.float32))
    idxs = [jnp.asarray(rng.randint(0, M, (B, H, W)).astype(np.int32))
            for _ in range(6)]
    for i in idxs:
        float(jnp.ravel(i)[0])

    @jax.jit
    def f_rows3(idx):
        g = table3[idx.reshape(-1)].reshape(B, H, W, 3)
        return jnp.sum(g, axis=-1)

    @jax.jit
    def f_packed(idx):
        return table1[idx.reshape(-1)].reshape(B, H, W)

    @jax.jit
    def f_row128(idx):
        r = rows[(idx // 128).reshape(-1)]        # (N, 128)
        lane = (idx % 128).reshape(-1)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
                  == lane[:, None])
        return jnp.sum(jnp.where(onehot, r, 0.0), axis=-1).reshape(B, H, W)

    @jax.jit
    def f_row128x2(idx):
        i0 = (idx // 128).reshape(-1)
        r0 = rows[i0]
        r1 = rows[jnp.minimum(i0 + 1, M // 128 - 1)]
        lane = (idx % 128).reshape(-1)
        it = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
        w0 = jnp.where(it == lane[:, None], 0.7, 0.0)
        w1 = jnp.where(it == jnp.minimum(lane + 1, 127)[:, None], 0.3, 0.0)
        v = jnp.sum(r0 * w0, -1) * 0.5 + jnp.sum(r1 * w1, -1) * 0.5
        return v.reshape(B, H, W)

    for name, fn in (("rows3", f_rows3), ("packed", f_packed),
                     ("row128", f_row128), ("row128x2", f_row128x2)):
        t = timed(fn, [(i,) for i in idxs])
        print(json.dumps({"strategy": name, "ms": round(t * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
