from eggshell_tpu.opt.levenberg_marquardt import (  # noqa: F401
    LMOptions,
    levenberg_marquardt,
)
from eggshell_tpu.opt.nelder_mead import nelder_mead  # noqa: F401
from eggshell_tpu.opt.random_search import random_search  # noqa: F401
from eggshell_tpu.opt.optimizer import (  # noqa: F401
    AbstractOptimizer,
    OptimizerFactory,
    RepeatedOptimizer,
)
