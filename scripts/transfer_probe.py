"""Micro-probe: relay h2d/d2h transfer cost for a (1000, 768) f32 query
batch vs the on-device whitening matmul, to attribute the serving path's
fixed costs."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from rag_cobweb_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

B, D, DO = 1000, 768, 248
hosts = [np.random.RandomState(i).randn(B, D).astype(np.float32)
         for i in range(16)]
W = jnp.asarray(np.random.RandomState(99).randn(D, DO).astype(np.float32))
mm = jax.jit(lambda x: x @ W)
devs = [jnp.asarray(h) for h in hosts]
jax.block_until_ready(devs)
jax.block_until_ready(mm(devs[0]))


def bench(name, fn, reps=8):
    fn(0)
    t0 = time.perf_counter()
    for i in range(reps):
        fn(i)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)


bench("h2d (1000,768) f32 + block",
      lambda i: jax.block_until_ready(jnp.asarray(hosts[i % 16])))
bench("h2d bf16 (1000,768) + block",
      lambda i: jax.block_until_ready(
          jnp.asarray(hosts[i % 16].astype(jnp.bfloat16))))
bench("d2h (1000,768) f32",
      lambda i: np.asarray(devs[i % 16]))
bench("whiten matmul, device-resident + block",
      lambda i: jax.block_until_ready(mm(devs[i % 16])))
bench("tiny sync (1-elem d2h)",
      lambda i: np.asarray(devs[i % 16][0, 0]))
bench("h2d + matmul + 1-elem d2h",
      lambda i: np.asarray(mm(jnp.asarray(hosts[i % 16]))[0, 0]))
