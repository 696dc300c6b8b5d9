# Environment setup for the recipe (reference path.sh counterpart).
# Source this from egs/gtsinger/ssc1 before running stages by hand:
#   . ./path.sh

# repo root = three levels up from this recipe dir (resolve symlinks so
# scratch dirs that symlink path.sh still find the real tree)
SERENADE_TPU_ROOT="$(cd "$(dirname "$(readlink -f "${BASH_SOURCE[0]:-$0}")")/../../.." && pwd)"
export SERENADE_TPU_ROOT
export PYTHONPATH="${SERENADE_TPU_ROOT}${PYTHONPATH:+:${PYTHONPATH}}"

# persistent XLA compile cache: first jit of the CFM sampler is slow,
# every later run hits this cache
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-${SERENADE_TPU_ROOT}/.jax_cache}"

# uncomment to force the virtual CPU mesh for laptop testing:
# export JAX_PLATFORMS=cpu
# export XLA_FLAGS="--xla_force_host_platform_device_count=8"
