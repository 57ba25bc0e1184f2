"""Microbenchmark: isolate VAN block costs on TPU (LKA depthwise convs
vs 1x1 convs vs MLP) to guide kernel optimization."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def bench(fn, x, name, iters=10):
    f = jax.jit(lambda v, i: jnp.sum(fn.apply(v, i).astype(jnp.float32)))
    v = jax.jit(lambda i: fn.init(jax.random.PRNGKey(0), i))(x)
    float(f(v, x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(v, x))
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{name}: {min(ts):.1f} ms")
    return min(ts)


class Stack(nn.Module):
    n: int = 27
    dim: int = 320
    mode: str = "full"   # full | no_dw | mlp_only | dw_only

    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            if self.mode in ("full", "no_dw"):
                h = nn.Conv(self.dim, (1, 1), dtype=x.dtype,
                            name=f"p1_{i}")(x)
                h = nn.gelu(h)
                if self.mode == "full":
                    h = nn.Conv(self.dim, (5, 5), padding=2,
                                feature_group_count=self.dim,
                                dtype=x.dtype, name=f"dw5_{i}")(h)
                    h = nn.Conv(self.dim, (7, 7), padding=9,
                                kernel_dilation=(3, 3),
                                feature_group_count=self.dim,
                                dtype=x.dtype, name=f"dw7_{i}")(h)
                h = nn.Conv(self.dim, (1, 1), dtype=x.dtype,
                            name=f"p2_{i}")(h)
                x = x + h
            if self.mode in ("full", "no_dw", "mlp_only"):
                h = nn.Conv(self.dim * 4, (1, 1), dtype=x.dtype,
                            name=f"fc1_{i}")(x)
                h = nn.gelu(h)
                h = nn.Conv(self.dim, (1, 1), dtype=x.dtype,
                            name=f"fc2_{i}")(h)
                x = x + h
            if self.mode == "dw_only":
                h = nn.Conv(self.dim, (5, 5), padding=2,
                            feature_group_count=self.dim,
                            dtype=x.dtype, name=f"dw5_{i}")(x)
                x = x + nn.Conv(self.dim, (7, 7), padding=9,
                                kernel_dilation=(3, 3),
                                feature_group_count=self.dim,
                                dtype=x.dtype, name=f"dw7_{i}")(h)
        return x


def main():
    for dtype in (jnp.bfloat16, jnp.float32):
        x = jnp.zeros((4, 64, 64, 320), dtype)
        name = "bf16" if dtype == jnp.bfloat16 else "f32"
        print(f"--- {name}, input [4, 64, 64, 320] ---")
        for mode in ("mlp_only", "dw_only", "no_dw", "full"):
            bench(Stack(mode=mode), x, f"{name} {mode} x27")


if __name__ == "__main__":
    main()
