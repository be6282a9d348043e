"""Test env: force CPU with 8 virtual devices so sharding logic is exercised
without multi-chip TPU hardware (SURVEY.md §4's multi-device-sim strategy).

NOTE: env-var overrides (JAX_PLATFORMS / XLA_FLAGS) do NOT work here — the
machine's sitecustomize force-registers the TPU backend and appends it to
``jax_platforms`` at interpreter start. The config calls below win because
they run before any backend is initialized."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
