"""Test harness config: force an 8-device CPU mesh so sharding tests run
without TPU hardware (the driver's multichip dry-run does the same)."""

import os

# force-override: the session environment may pin JAX_PLATFORMS to the TPU
# ('axon') platform; unit tests must run on the virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = os.environ.get("SEQDEX_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# registry canonical names default to the reference scene budget (heap /
# studded socket); unit tests exercise those variants explicitly and use
# the lite scenes everywhere else (a 107-brick settle pool per test build
# would swamp the CPU suite)
os.environ.setdefault("SEQDEX_LITE", "1")
# persistent compile cache: REPO-LOCAL dir (not ~/.jax_cache — a shared
# cache can hold XLA:CPU AOT entries compiled on a different machine whose
# feature set mismatches; loading those spams errors and can SIGILL).
# The default fast suite also passes cold in ~5 min without any cache.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))

# the environment's sitecustomize registers the TPU ('axon') PJRT plugin at
# interpreter start and pins jax to it BEFORE this conftest runs — the env
# var alone is ignored. Override through jax.config (works as long as no
# backend has been initialised yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
