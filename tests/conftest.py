import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs the real
# multi-chip path via __graft_entry__.dryrun_multichip).
#
# NOTE: this environment may pre-register a TPU PJRT plugin ("axon") from
# sitecustomize and force jax_platforms to it; jax.config.update below wins
# as long as no backend has been initialized yet, which is why this must be
# in conftest (imported before any test touches jax).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
