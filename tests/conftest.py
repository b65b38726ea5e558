"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY §4 implication)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The suite runs the SHIPPED defaults (extraction stays opt-in — it lost
# its hardware A/B in round 3). The extraction engine keeps dedicated
# interpret-mode coverage via explicit opt-ins in test_coarse_scan.py and
# test_pallas_scan.py; not forcing it suite-wide also halves the number
# of compiled search variants (see the XLA:CPU crash caveat, RESULTS.md).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; force it back — tests must run on local CPU.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat pytest runs skip XLA recompiles.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# 0.0, not 0.5: cache EVERY executable. This image's XLA:CPU segfaults
# stochastically during compilation once a process has compiled a few
# hundred programs (RESULTS.md environment caveats); with a warm cache a
# suite run compiles almost nothing, which both speeds it up and removes
# most of the crash exposure.

import numpy as np
import pytest

_INDEX_CACHE = {}


@pytest.fixture(scope="session")
def random_data():
    """Shared fixture mirroring the reference's build_index_random_data
    (test/index.jl:1-28): n=243, d=10 uniform random."""
    rng = np.random.RandomState(42)
    return rng.rand(243, 10)


def build_random_index(data, coarse_quantizer="naive", index_dtype="uint32",
                       **overrides):
    """Build (or clone from cache) the shared 243x10 test index. Builds are
    deterministic given the seed, so tests that mutate get a fresh clone of
    one cached build instead of paying a full rebuild."""
    from ivfadc_tpu import IVFADCIndex
    kwargs = dict(kc=100, k=16, m=2, coarse_quantizer=coarse_quantizer,
                  index_dtype=index_dtype, coarse_maxiter=25,
                  quantization_maxiter=25, seed=7)
    kwargs.update(overrides)
    cache_key = (data.tobytes()[:64], data.shape,
                 tuple(sorted(kwargs.items())))
    if cache_key not in _INDEX_CACHE:
        _INDEX_CACHE[cache_key] = IVFADCIndex.build(data, **kwargs)
    return _clone_index(_INDEX_CACHE[cache_key])


def _clone_index(idx):
    """Independent mutable copy: host-side store arrays are copied; immutable
    device arrays (centroids, codebooks) are shared."""
    from ivfadc_tpu.models.index import IVFADCIndex
    from ivfadc_tpu.models.inverted import PostingStore
    store = PostingStore(
        idx.store.kc, idx.store.m, idx.store.code_dtype,
        offsets=idx.store.offsets.copy(), caps=idx.store.caps.copy(),
        sizes=idx.store.sizes.copy(), codes=idx.store.codes.copy(),
        ids=idx.store.ids.copy())
    return IVFADCIndex(idx.config, idx.coarse, idx.quantizer, store,
                       idx.data_dtype, idx.dim)
