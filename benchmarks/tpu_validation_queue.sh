#!/bin/bash
# TPU validation queue (round-2 origin; round-5 additions at the end):
# waits for the tunneled TPU to come back,
# then runs every pending hardware A/B in sequence (each driver isolates
# engines in subprocesses — a Mosaic compile error poisons a process).
#
# Ordered by value density: if the tunnel returns only briefly, the
# highest-impact measurements (and the ones whose Pallas compiles land in
# the persistent cache the driver's bench.py will reuse) run first.
#
# Decision rules after it completes:
#   * ab_extract  wins -> default IVFADC_EXTRACT on (models/index.py
#                         _env_extract) + drop the conftest opt-in
#   * ab_rank v2  wins -> default IVFADC_RANK_ENGINE=v2
#   * ab_coarse v2 wins -> default IVFADC_COARSE_ENGINE=v2
#   * sweep: a pb/chunk beating 64/1024 -> change IVFADCConfig defaults
#   * deep1b_shape / gather_microbench -> tune scan_gather_win default
# then re-run bench.py and refresh RESULTS.md.
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 600); do
  if timeout 300 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" 2>/dev/null; then
    echo "TPU back after $i probes"
    break
  fi
  echo "probe $i: TPU unavailable"; sleep 60
done
timeout 300 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" 2>/dev/null \
  || { echo "TPU never returned; aborting queue"; exit 0; }
echo "=== extract A/B ==="
timeout 5400 python benchmarks/ab_extract.py 2>&1 | grep -E "RESULT|\["
echo "=== rank A/B ==="
timeout 3600 python benchmarks/ab_rank.py 2>&1 | grep -E "RESULT|FAILED"
echo "=== coarse A/B ==="
timeout 5400 python benchmarks/ab_coarse.py --e2e 2>&1 | grep -E "RESULT|FAILED"
echo "=== combined-engine bench (extract + rank v2 + coarse v2) ==="
IVFADC_EXTRACT=1 IVFADC_RANK_ENGINE=v2 IVFADC_COARSE_ENGINE=v2 \
  timeout 3600 python bench.py 2>&1 | tail -2
echo "=== default-engine bench (contrast) ==="
timeout 3600 python bench.py 2>&1 | tail -2
echo "=== pb/chunk sweep under the production kernel (ids2d + extraction) ==="
# the scan kernel looks grid-step-overhead bound (~3073 tiles x ~0.8us vs a
# 0.3 ms DMA roofline): larger pb halves the tile count
IVFADC_EXTRACT=1 IVFADC_SWEEP_GRID="fold:64,128,256:1024,2048" \
  timeout 7200 python benchmarks/sweep_kernel.py 2>&1 | grep RESULT
echo "=== deep1b gathered A/B ==="
timeout 5400 python benchmarks/deep1b_shape.py 2>&1 | grep -E "RESULT|plan|build|\["
echo "=== gather microbench ==="
timeout 1800 python benchmarks/gather_microbench.py 2>&1 | tail -10
echo "=== [round 5] v/base derivation A/B (measured wash; re-check on new runtimes) ==="
timeout 3000 python benchmarks/ab_vbase.py 2>&1 | grep -E "RESULT|BEST"
echo "=== [round 5] cached-norms A/B (won 1.06x, now default; re-validate) ==="
timeout 3000 python benchmarks/ab_norms.py 2>&1 | grep -E "RESULT|BEST"
echo "=== [round 5] k-means|| seeding recall A/B at Deep1B shape ==="
timeout 3600 python benchmarks/ab_seeding.py 2>&1 | grep -E "RESULT|build"
echo "=== [round 5] serving under mutation (epoch swap) ==="
timeout 1800 python benchmarks/serving_bench.py 2>&1 | grep -E "RESULT|mutation"
echo "=== queue done ==="
