from eggshell_tpu.ops import quaternion  # noqa: F401
