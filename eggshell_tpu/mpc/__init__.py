from eggshell_tpu.mpc.sampling import SamplingMPC, mppi_update  # noqa: F401
from eggshell_tpu.mpc.gradient import gradient_mpc_update  # noqa: F401
