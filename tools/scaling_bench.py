"""Weak-scaling harness — the BASELINE.json scaling metric
(rollouts/s at 1 chip / N devices, efficiency vs linear).

On real multi-chip hardware this measures ICI-sharded rollouts; without
it (this box has one tunneled chip), run with a virtual CPU mesh to
validate the sharding path and measure the collective/sharding overhead
shape:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py

For multi-host runs, call jax.distributed.initialize() first (one
process per host) — the mesh spans all processes' devices automatically.

Prints one JSON line per device count plus a summary efficiency figure.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# The ambient axon (tunneled-TPU) integration overrides JAX_PLATFORMS
# and can hang connecting to the tunnel; when the caller asked for the
# virtual CPU mesh, force it through the config API too (same fix as
# tests/conftest.py).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")


def main(per_device_batch: int = 256, horizon: int = 20,
         artifact: str = None):
    import platform

    from eggshell_tpu.parallel import mesh as pmesh
    from eggshell_tpu.physics import scenes
    from eggshell_tpu.utils.config import SimConfig, SolverKind

    dtype = jnp.float32
    cfg = SimConfig(
        solver=SolverKind.JACOBI, solver_iters=30, jacobi_omega=0.3,
        conditional_cfm=False, cfm_always=0.01, contact_capacity=20,
    )
    spec, state = scenes.box_stack(4, dtype=dtype)
    ndev_all = len(jax.devices())
    counts = sorted({1, 2, ndev_all} & set(range(1, ndev_all + 1)))

    def run(nd, B):
        states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), state
        )
        m = pmesh.make_mesh(nd)
        states = pmesh.shard_batch(m, states)
        out = pmesh.sharded_rollout(spec, states, cfg, horizon, m)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):          # best-of-3: the host may be shared
            t0 = time.perf_counter()
            out = pmesh.sharded_rollout(spec, states, cfg, horizon, m)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return B / best

    cpu_count = __import__("os").cpu_count()
    virtual = jax.default_backend() == "cpu" and ndev_all > 1
    results = []
    record = {
        "backend": jax.default_backend(),
        "devices_total": ndev_all,
        "cpu_count": cpu_count,
        "platform": platform.platform(),
        "horizon": horizon,
        "per_device_batch": per_device_batch,
        "interpretation": (
            "virtual CPU mesh: the 1-device baseline already uses every "
            "physical core via XLA intra-op parallelism, so the "
            "weak-scaling rows measure core oversubscription, NOT "
            "sharding cost; the sharding_overhead_control row (fixed "
            "total batch, throughput_sharded / throughput_unsharded; "
            ">=1.0 means the shard_map machinery is free) is the "
            "meaningful machinery metric on this host. The >=0.9 "
            "weak-scaling target is a real-multi-chip (ICI) metric — "
            "see __graft_entry__.dryrun_multichip for the sharded-path "
            "validation."
            if virtual else
            "real device mesh: weak_scaling_efficiency is the "
            "BASELINE.json metric."
        ),
        "weak_scaling": [],
    }
    for nd in counts:
        B = per_device_batch * nd
        rps = run(nd, B)
        results.append((nd, rps))
        row = {
            "devices": nd, "batch": B, "rollouts_per_s": round(rps, 1),
            "per_device": round(rps / nd, 1),
        }
        record["weak_scaling"].append(row)
        print(json.dumps(row))
    if len(results) > 1:
        base = results[0][1] / results[0][0]
        eff = results[-1][1] / results[-1][0] / base
        summary = {
            "metric": "weak-scaling efficiency",
            "devices": results[-1][0],
            "value": round(eff, 3),
            "target": 0.9,
        }
        if virtual:
            summary["host_core_bound"] = True
            summary["note"] = (
                f"{results[-1][0]} virtual devices share {cpu_count} "
                "physical cores and the 1-device baseline is itself "
                "multi-core — this row is a lower bound with no "
                "sharding-cost signal; see sharding_overhead_control"
            )
        record["weak_scaling_efficiency"] = summary
        print(json.dumps(summary))

        # fixed-total-work control: on an oversubscribed virtual-device
        # CPU mesh the 1-device baseline uses ALL cores via XLA intra-op
        # parallelism, so the weak-scaling figure is a LOWER bound; this
        # control isolates the pure sharding/collective overhead (1.0 =
        # sharding is free at equal total compute).  Measured at SEVERAL
        # total batch sizes: a single point can be dominated by how well
        # XLA intra-op happens to parallelize that one shape (r2's 1.75
        # control meant the unsharded baseline was the inefficient side);
        # the MINIMUM over the series is the honest upper bound on the
        # sharding machinery's cost.
        nd_last = counts[-1]
        series = []
        for B_fix in (nd_last * 64, nd_last * per_device_batch,
                      nd_last * 4 * per_device_batch):
            r1 = run(1, B_fix)
            rN = run(nd_last, B_fix)
            series.append({"batch": B_fix, "value": round(rN / r1, 3)})
        ctrl = {
            "metric": "sharding overhead control "
                      "(fixed total batch, t1/tN)",
            "devices": nd_last,
            "series": series,
            "value": min(s["value"] for s in series),
            "note": "1.0 means sharding adds no overhead at equal "
                    "total compute; virtual CPU devices share the "
                    "physical cores so this, not the weak-scaling row, "
                    "measures the sharding machinery itself.  Values "
                    ">1.0 mean the unsharded single-device baseline is "
                    "the inefficient side (XLA intra-op); min over the "
                    "batch series bounds the machinery cost.",
        }
        record["sharding_overhead_control"] = ctrl
        print(json.dumps(ctrl))
    if artifact:
        # lead with the meaningful machinery metric on virtual meshes
        order = [
            "backend", "devices_total", "cpu_count", "platform",
            "horizon", "per_device_batch", "interpretation",
            "sharding_overhead_control", "weak_scaling_efficiency",
            "weak_scaling",
        ]
        record = {k: record[k] for k in order if k in record}
        with open(artifact, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    import sys

    art = sys.argv[1] if len(sys.argv) > 1 else None
    main(artifact=art)
