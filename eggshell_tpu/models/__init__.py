from eggshell_tpu.models.api import Model, Parameter  # noqa: F401
