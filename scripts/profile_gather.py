"""Compare XLA gather vs Pallas DMA gather kernels on the real chip."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from heat_tpu.ops.pallas.gather import gather_rows, history_mean_gather
from heat_tpu.models.aggregator import history_mean

N, D = 91_599, 128
B, H, K = 8192, 100, 16
STEPS = 20


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _ = np.asarray(out.ravel()[0])
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:30s} {dt*1e3:8.3f} ms")
    return out


def main():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (N, D), jnp.float32)
    ids = jax.random.randint(k2, (B * H,), 0, N, dtype=jnp.int32)
    his_ids = ids.reshape(B, H)
    mask = jax.random.randint(k3, (B,), 1, H + 1, dtype=jnp.int32)

    xla_gather = jax.jit(lambda t, i: t[i])
    out_x = timeit("xla gather 819k rows", xla_gather, table, ids)
    out_p = timeit("pallas gather 819k rows", gather_rows, table, ids)
    np.testing.assert_array_equal(np.asarray(out_x), np.asarray(out_p))
    print("gather parity ok")

    xla_mean = jax.jit(lambda t, hi, m: history_mean(t[hi], m))
    m_x = timeit("xla his-mean (gather+mean)", xla_mean, table, his_ids, mask)
    m_p = timeit("pallas fused his-mean", history_mean_gather, table, his_ids, mask)
    np.testing.assert_allclose(
        np.asarray(m_x), np.asarray(m_p), rtol=1e-5, atol=1e-6
    )
    print("his-mean parity ok")


if __name__ == "__main__":
    main()
