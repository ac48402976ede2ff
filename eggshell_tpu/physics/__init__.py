from eggshell_tpu.physics.scene import SceneSpec, State  # noqa: F401
from eggshell_tpu.physics.stepper import (  # noqa: F401
    step_ode,
    step_explicit_euler,
    init_stabilize,
    post_stabilize,
    position_constraint_error,
)
