"""Measure mask vs sorted-SaP broadphase on the default backend.

Round-5 question (VERDICT missing #2): does a sorted sweep-and-prune
(toolkit/collision.h:22-45 analog) beat the (n, n) broadcast mask on
TPU, and at what body count?  Times ONLY the per-scene pair selection
(select_scene_pairs under vmap over a small batch), not the narrowphase.

Usage: python tools/proto_broadphase_bench.py [out.json]
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from eggshell_tpu.ops import broadphase
from eggshell_tpu.physics import scenes
from eggshell_tpu.utils.config import SimConfig


def timeit(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        best = min(best, time.perf_counter() - t0)
    return best


def main(out_path=None):
    rows = []
    for n, B, cap, win in [(216, 8, 1024, 48), (512, 4, 2048, 64),
                           (1000, 2, 4096, 96), (1728, 1, 8192, 128)]:
        spec, st = scenes.box_pile(n, dtype=jnp.float32)
        states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)
        row = {"n": n, "batch": B, "pair_capacity": cap, "window": win}
        for kind in ("mask", "sap"):
            cfg = SimConfig(pair_capacity=cap, broadphase_margin=0.05,
                            broadphase_kind=kind, sap_window=win,
                            contact_capacity=cap)

            REPS = 20      # amortize the ~70 ms tunnel dispatch floor

            @jax.jit
            def select_all(sts, _cfg=cfg):
                # scan REPS perturbed selects so XLA cannot CSE them;
                # reported time is per-select
                def body(c, i):
                    sts_i = sts._replace(p=sts.p + 1e-6 * i)
                    pi, pj, act = jax.vmap(
                        lambda s1: broadphase.select_scene_pairs(
                            spec, s1, _cfg)
                    )(sts_i)
                    return c + jnp.sum(act), None

                tot, _ = jax.lax.scan(
                    body, jnp.int32(0), jnp.arange(REPS, dtype=jnp.float32))
                return tot

            dt = timeit(select_all, states)
            row[kind + "_ms"] = round(dt * 1e3 / REPS, 3)
            pi, pj, act = jax.vmap(
                lambda s1: broadphase.select_scene_pairs(spec, s1, cfg)
            )(states)
            row[kind + "_active_pairs"] = int(jnp.sum(act[0]))
        row["sap_speedup"] = round(row["mask_ms"] / row["sap_ms"], 2)
        rows.append(row)
        print(json.dumps(row))
    rec = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]), "rows": rows}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
