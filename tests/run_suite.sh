#!/bin/bash
# Run the test suite in 3 process batches: a single monolithic pytest
# process can segfault inside the XLA CPU compiler under the memory
# pressure of hundreds of distinct jit compilations (observed with
# jax 0.9.0 LLVM backend); separate processes bound the compile cache.
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       XLA_FLAGS=--xla_force_host_platform_device_count=8
FILES=$(ls tests/test_*.py | sort)
N=$(echo "$FILES" | wc -l)
H=$(( (N + 2) / 3 ))
fail=0
for b in 1 2 3; do
  case $b in
    1) BATCH=$(echo "$FILES" | head -$H) ;;
    2) BATCH=$(echo "$FILES" | head -$((2*H)) | tail -$H) ;;
    3) BATCH=$(echo "$FILES" | tail -$((N - 2*H))) ;;
  esac
  echo "=== batch $b ==="
  python -m pytest $BATCH -q -p no:cacheprovider || fail=1
done
exit $fail
