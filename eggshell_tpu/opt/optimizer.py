"""Iterative optimizer framework — the toolkit/optimizer.{h,cc} shape.

The reference's AbstractOptimizer protocol (Initialize2/DoOneIteration2,
toolkit/optimizer.h:40-122) exists so a GUI thread can drive and abort
long optimisations; here the same stepwise protocol lets notebook /
service code interleave optimisation with logging, checkpointing, or
early abort, and `RepeatedOptimizer` restarts to escape local minima
(ref optimizer.h:207-219).  `OptimizerFactory` maps the reference's
algorithm names (ref optimizer.h:145-154).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class AbstractOptimizer:
    """Stepwise protocol: initialize() yields the first parameter vector;
    step(error) consumes the objective at the last parameters and yields
    the next ones, or None when done."""

    def initialize(self, x0: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def step(self, error: float) -> Optional[np.ndarray]:
        raise NotImplementedError

    def best(self) -> Tuple[np.ndarray, float]:
        raise NotImplementedError


class _FnDrivenOptimizer(AbstractOptimizer):
    """Adapts a batch JAX optimizer into the stepwise protocol by running
    it whole-hog on initialize (the interactive granularity of the
    reference is a GUI concern; abort-ability comes from the repeated
    wrapper)."""

    def __init__(self, run: Callable[[np.ndarray], Tuple[np.ndarray, float]]):
        self._run = run
        self._best = None

    def initialize(self, x0):
        x, f = self._run(np.asarray(x0, float))
        self._best = (np.asarray(x), float(f))
        return None

    def step(self, error):
        return None

    def best(self):
        return self._best


class RepeatedOptimizer(AbstractOptimizer):
    """Run an optimizer `repeats` times from jittered starts, keep the
    best (ref RepeatedOptimizer, toolkit/optimizer.h:207-219)."""

    def __init__(self, make: Callable[[], AbstractOptimizer], repeats: int = 3,
                 jitter: float = 0.1, seed: int = 0):
        self.make = make
        self.repeats = repeats
        self.jitter = jitter
        self.seed = seed
        self._best = None

    def initialize(self, x0):
        rng = np.random.default_rng(self.seed)
        for i in range(self.repeats):
            start = np.asarray(x0, float)
            if i > 0:
                start = start + rng.normal(scale=self.jitter, size=start.shape)
            opt = self.make()
            opt.initialize(start)
            cand = opt.best()
            if cand is not None and (
                self._best is None or cand[1] < self._best[1]
            ):
                self._best = cand
        return None

    def step(self, error):
        return None

    def best(self):
        return self._best


class OptimizerFactory:
    """Map algorithm names to optimizers over a scalar objective
    f: R^n -> R (ref OptimizerFactory, toolkit/optimizer.h:145-154).
    Names: 'nelder_mead', 'random_search', 'levenberg_marquardt'
    (LM treats f as a single residual sqrt(f))."""

    @staticmethod
    def create(
        name: str,
        fn: Callable,
        *,
        bounds=None,
        key=None,
        **kw,
    ) -> AbstractOptimizer:
        from eggshell_tpu.opt.levenberg_marquardt import (
            LMOptions, levenberg_marquardt,
        )
        from eggshell_tpu.opt.nelder_mead import nelder_mead
        from eggshell_tpu.opt.random_search import random_search

        if name == "nelder_mead":
            def run(x0):
                res = nelder_mead(fn, jnp.asarray(x0), **kw)
                return np.asarray(res.x), float(res.fun)

        elif name == "random_search":
            lo, hi = bounds
            k = key if key is not None else jax.random.PRNGKey(0)

            def run(x0):
                res = random_search(
                    fn, jnp.asarray(lo, jnp.float64),
                    jnp.asarray(hi, jnp.float64), k, **kw
                )
                return np.asarray(res.x), float(res.fun)

        elif name == "levenberg_marquardt":
            def residual(x):
                return jnp.atleast_1d(fn(x))

            def run(x0):
                res = levenberg_marquardt(
                    residual, jnp.asarray(x0), kw.get("options", LMOptions())
                )
                return np.asarray(res.x), float(res.error)

        else:
            raise ValueError(f"unknown optimizer {name!r}")
        return _FnDrivenOptimizer(run)
