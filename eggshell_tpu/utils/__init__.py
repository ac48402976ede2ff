from eggshell_tpu.utils.config import SimConfig  # noqa: F401
