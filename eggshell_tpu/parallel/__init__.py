from eggshell_tpu.parallel.rollout import (  # noqa: F401
    batch_states,
    rollout_batched,
)
# NOTE: the `rollout` *function* is intentionally not re-exported here —
# it would shadow the `eggshell_tpu.parallel.rollout` module attribute.
# Use `from eggshell_tpu.parallel.rollout import rollout`.
