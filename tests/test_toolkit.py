"""Toolkit-tier tests: optimizers, tracing, SI prefixes, hashing,
mat-file IO, broadphase, checkpointing, error funnel."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eggshell_tpu.opt import (
    LMOptions,
    OptimizerFactory,
    levenberg_marquardt,
    nelder_mead,
    random_search,
)
from eggshell_tpu.ops import broadphase
from eggshell_tpu.utils import errors, hashing, si_prefix, trace
from eggshell_tpu.utils.mat_file import MatFile, load_mat


# ---------------------------------------------------------------- optimizers


def test_lm_rosenbrock_residuals():
    """LM on the classic (1-x, 10(y-x^2)) residuals -> (1, 1)."""

    def resid(x):
        return jnp.asarray([1.0 - x[0], 10.0 * (x[1] - x[0] ** 2)])

    res = levenberg_marquardt(
        resid, jnp.asarray([-1.2, 1.0]), LMOptions(max_iterations=100)
    )
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-6)


def test_lm_curve_fit():
    """Fit y = a exp(b t) to noiseless data."""
    t = jnp.linspace(0, 1, 20)
    y = 2.0 * jnp.exp(-1.5 * t)

    def resid(p):
        return p[0] * jnp.exp(p[1] * t) - y

    res = levenberg_marquardt(resid, jnp.asarray([1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(res.x), [2.0, -1.5], atol=1e-6)


def test_nelder_mead_quadratic():
    def fn(x):
        return (x[0] - 3.0) ** 2 + 2.0 * (x[1] + 1.0) ** 2

    res = nelder_mead(fn, jnp.asarray([0.0, 0.0]), max_iterations=400)
    np.testing.assert_allclose(np.asarray(res.x), [3.0, -1.0], atol=1e-3)


def test_random_search_bounds():
    def fn(x):
        return jnp.sum((x - 0.5) ** 2)

    res = random_search(
        fn, jnp.asarray([-1.0, -1.0]), jnp.asarray([1.0, 1.0]),
        jax.random.PRNGKey(0), num_samples=4096,
    )
    assert float(res.fun) < 1e-2


def test_optimizer_factory():
    def fn(x):
        return jnp.sum((x - 2.0) ** 2)

    opt = OptimizerFactory.create("nelder_mead", fn, max_iterations=300)
    opt.initialize(np.zeros(2))
    x, f = opt.best()
    np.testing.assert_allclose(x, [2.0, 2.0], atol=1e-3)

    opt = OptimizerFactory.create(
        "random_search", fn, bounds=(np.asarray([0.0, 0.0]), np.asarray([4.0, 4.0]))
    )
    opt.initialize(np.zeros(2))
    _, f = opt.best()
    assert f < 0.1


# ------------------------------------------------------------------- tracing


def test_trace_scopes():
    trace.trace_start()
    import time as _t

    with trace.Trace("outer"):
        _t.sleep(0.01)
        with trace.Trace("inner"):
            _t.sleep(0.02)
    t = trace.timings()
    assert t["inner"][2] == 1 and t["outer"][2] == 1
    # inner total ~20ms; outer exclusive ~10ms < outer total ~30ms
    assert t["inner"][1] >= 15_000
    assert t["outer"][0] < t["outer"][1]
    rep = trace.trace_report()
    assert "outer" in rep and "inner" in rep


# ------------------------------------------------------------------ utilities


def test_si_prefix_roundtrip():
    assert si_prefix.si_prefix(1.23e-8) == "12.3n"
    assert si_prefix.si_prefix(1500.0) == "1.5k"
    assert abs(si_prefix.si_parse("12.3n") - 1.23e-8) < 1e-15
    assert si_prefix.si_prefix(0) == "0"


def test_hashing():
    h1 = hashing.hash_pytree({"a": np.arange(5), "b": np.eye(2)})
    h2 = hashing.hash_pytree({"a": np.arange(5), "b": np.eye(2)})
    h3 = hashing.hash_pytree({"a": np.arange(5), "b": 2 * np.eye(2)})
    assert h1 == h2 != h3


def test_mat_file_roundtrip(tmp_path):
    path = str(tmp_path / "out.mat")
    with MatFile(path) as mf:
        mf.write("dense", np.arange(6.0).reshape(2, 3))
        mf.write("cplx", np.asarray([1 + 2j, 3 - 4j]))
        mf.write_scalar("s", 42.0)
        import scipy.sparse as sp

        mf.write_sparse("sp", sp.eye(4))
    out = load_mat(path)
    np.testing.assert_allclose(out["dense"], np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.ravel(out["cplx"]), [1 + 2j, 3 - 4j])
    assert float(np.ravel(out["s"])[0]) == 42.0


def test_error_funnel():
    captured = []
    errors.set_error_handler(lambda lvl, msg: captured.append((lvl, msg)))
    try:
        errors.warning("w %d", 1)
        errors.error("e")
        with pytest.raises(errors.PanicError):
            errors.panic("boom %s", "x")
        with pytest.raises(errors.PanicError):
            errors.check(False, "chk")
    finally:
        errors.set_error_handler(None)
    assert captured[0] == ("Warning", "w 1")
    assert ("Panic", "boom x") in captured


# ---------------------------------------------------------------- broadphase


def test_broadphase_prunes_correctly():
    rng = np.random.default_rng(0)
    n = 20
    p = jnp.asarray(rng.uniform(-3, 3, (n, 3)))
    q = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    h = jnp.full((n, 3), 0.2)
    pi = jnp.asarray([i for i in range(n) for j in range(i + 1, n)], jnp.int32)
    pj = jnp.asarray([j for i in range(n) for j in range(i + 1, n)], jnp.int32)
    mask = broadphase.pair_overlap_mask(p, q, h, pi, pj)
    # oracle: center distance per axis <= sum of extents
    pn = np.asarray(p)
    for k in range(len(pi)):
        i, j = int(pi[k]), int(pj[k])
        want = bool(np.all(np.abs(pn[i] - pn[j]) <= 0.4 + 1e-12))
        assert bool(mask[k]) == want

    si, sj, act = broadphase.select_pairs(mask, pi, pj, 16)
    assert int(act.sum()) == min(16, int(mask.sum()))


def test_broadphase_respects_rotation():
    # rotated box has larger AABB
    q45 = jnp.asarray([np.cos(np.pi / 8), 0, 0, np.sin(np.pi / 8)])
    p = jnp.asarray([[0.0, 0, 0], [0.45, 0, 0]])
    q = jnp.stack([q45, jnp.asarray([1.0, 0, 0, 0])])
    h = jnp.full((2, 3), 0.2)
    pi, pj = jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32)
    assert bool(broadphase.pair_overlap_mask(p, q, h, pi, pj)[0])
    q_axis = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
    assert not bool(broadphase.pair_overlap_mask(p, q_axis, h, pi, pj)[0])


def test_contacts_with_broadphase_match_without():
    from eggshell_tpu.physics import scenes
    from eggshell_tpu.physics.contacts import make_contacts
    from eggshell_tpu.utils.config import SimConfig

    spec, state = scenes.box_stack(6)
    cfg_all = SimConfig(contact_capacity=48)
    cfg_bp = cfg_all.replace(pair_capacity=8, broadphase_margin=0.01)
    cs_all = make_contacts(spec, state, cfg_all)
    cs_bp = make_contacts(spec, state, cfg_bp)
    # same set of active contacts (order may differ)
    def as_set(cs):
        act = np.flatnonzero(np.asarray(cs.active))
        return {
            (int(cs.b0[k]), int(cs.b1[k]), tuple(np.round(np.asarray(cs.position[k]), 9)))
            for k in act
        }
    assert as_set(cs_all) == as_set(cs_bp)


# -------------------------------------------------------------- checkpointing


def test_checkpoint_roundtrip(tmp_path):
    from eggshell_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    tree = {
        "state": {"p": jnp.arange(6.0).reshape(2, 3)},
        "controls": jnp.ones((4, 6)),
        "step": jnp.asarray(7),
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree)
    out = restore_checkpoint(path)
    np.testing.assert_allclose(np.asarray(out["state"]["p"]), np.asarray(tree["state"]["p"]))
    assert int(np.asarray(out["step"])) == 7
