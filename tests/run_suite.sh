#!/bin/bash
# Run the test suite in separate process batches: a single monolithic
# pytest process can segfault inside the XLA CPU compiler under the
# memory pressure of hundreds of distinct jit compilations (observed
# with jax 0.9.0 LLVM backend inside backend_compile_and_load); separate
# processes bound the compile cache.  6 batches keeps each process well
# under the observed crash threshold.
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       XLA_FLAGS=--xla_force_host_platform_device_count=8
FILES=($(ls tests/test_*.py | sort))
N=${#FILES[@]}
B=6
fail=0
for ((b=0; b<B; b++)); do
  BATCH=()
  for ((i=b; i<N; i+=B)); do
    BATCH+=("${FILES[$i]}")
  done
  echo "=== batch $((b+1))/$B: ${BATCH[@]} ==="
  python -m pytest "${BATCH[@]}" -q -p no:cacheprovider || fail=1
done
exit $fail
