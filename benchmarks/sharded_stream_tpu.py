"""Single-chip TPU measurement: pipelined sharded `search_stream` vs the
blocking sharded `search_padded` loop (VERDICT r1 item 4 done-criterion).

Real scaling cannot be measured on one chip; the deliverable is that the
overlapped/pipelined path does not regress vs blocking at S=1, where the
double-buffered merge is pure overhead if mis-structured. Run:

    python benchmarks/sharded_stream_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax_compile"))

import jax
import jax.numpy as jnp
import numpy as np

from ivfadc_tpu import IVFADCIndex
from ivfadc_tpu.parallel.mesh import make_mesh
from ivfadc_tpu.parallel.sharded import ShardedIVFADCIndex
from ivfadc_tpu.utils.datasets import synthetic_clustered_device
from ivfadc_tpu.utils.timing import roundtrip_latency, true_time

N, D, KC, M, NPROBE, K, BATCH, NQ = 1_000_000, 128, 1024, 8, 8, 10, 16384, 16384


def main():
    print("backend:", jax.default_backend(), jax.devices())
    based = synthetic_clustered_device(N, D, seed=0)
    t0 = time.time()
    index = IVFADCIndex.build(based, kc=KC, k=256, m=M, seed=0,
                              kmeanspp_sample=65536)
    print(f"build {time.time() - t0:.1f}s")
    mesh = make_mesh(n_shards=1, n_data=1)
    sidx = ShardedIVFADCIndex(index, mesh)

    key = jax.random.PRNGKey(1)
    qidx = jax.random.randint(key, (NQ,), 0, N)
    qdev = based[qidx] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(2), (NQ, D), jnp.float32)

    base_lat = roundtrip_latency()
    nb = NQ // BATCH

    def run_block(i):
        return [sidx._dispatch(qdev[s * BATCH:(s + 1) * BATCH] + 1e-6 * i,
                               K, NPROBE, False)[:2] for s in range(nb)]

    def run_pipe(i):
        return [sidx._dispatch(qdev[s * BATCH:(s + 1) * BATCH] + 1e-6 * i,
                               K, NPROBE, True)[:2] for s in range(nb)]

    t_block = true_time(run_block, reps=10, warm=2, baseline=base_lat)
    t_pipe = true_time(run_pipe, reps=10, warm=2, baseline=base_lat)
    qb, qp = NQ / t_block, NQ / t_pipe
    print(f"blocking  {t_block * 1e3:8.2f} ms/wave  {qb / 1e6:.3f}M QPS")
    print(f"pipelined {t_pipe * 1e3:8.2f} ms/wave  {qp / 1e6:.3f}M QPS")
    print(f"pipelined/blocking = {qp / qb:.3f}x "
          f"({'no regression' if qp >= 0.9 * qb else 'REGRESSION'})")

    # agreement sanity at this scale
    ib, db, B = sidx._dispatch(qdev[:4096], K, NPROBE, False)
    io, do, _ = sidx._dispatch(qdev[:4096], K, NPROBE, True)
    ib, io = np.asarray(ib[:256]), np.asarray(io[:256])
    jac = np.mean([len(set(a[a >= 0]) & set(b[b >= 0])) / K
                   for a, b in zip(ib, io)])
    print(f"overlap-vs-blocking neighbor agreement (256q): {jac:.4f}")


if __name__ == "__main__":
    main()
