"""Virtual-device scaling curve for the batched multi-stream mode.

VERDICT r3 item 5: the 16-stream lockstep mode (BASELINE.json config 5)
measured over a 1/2/4/8-device mesh. Each device count runs in its OWN
child process (the forced-host device count must be set before jax
imports); the child bootstraps one real map, broadcasts it to 16 streams,
shards the stream axis over the mesh (`parallel.streams.shard_streams`),
and measures aggregate lockstep fps + per-step latency.

Caveat (read before comparing the fps column across rows): this box has
ONE physical CPU core, so N virtual devices time-slice one core — the
curve validates the sharding/collective MECHANICS (per-step overhead must
stay flat as collectives enter at N>1, and every N must produce the same
trajectory), not parallel speedup. On real multi-chip ICI the same program
shards the same way (see __graft_entry__.dryrun_multichip).

Usage: python scripts/scaling_curve.py [--devices 1 2 4 8] [--steps 8]
Prints one JSON line per device count and a summary table.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(n_dev: int, n_steps: int) -> None:
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REPO)
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.models.system import System, SLAMConfig
    from plslam_tpu.parallel import streams as pstreams
    from plslam_tpu.parallel.multistream import BatchedTracker

    S = 16
    scene = synthetic.make_scene(seed=7)
    Ts_gt = synthetic.trajectory(24, "orbit", amplitude=1.0)
    cfg = SLAMConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                     k1=0, k2=0, p1=0, p2=0, k3=0,
                     n_features=384, n_levels=3, max_kf=10, max_pt=3072,
                     n_lf=64, ba_window=4, ba_points=768, ba_lines=64,
                     kf_max_interval=5, use_loop_closing=False)
    boot = System(cfg)
    i = 0
    while boot.state != "OK" and i < 6:
        boot.track_monocular(synthetic.render(scene, Ts_gt[i]), i / 30.0)
        i += 1
    assert boot.state == "OK", "bootstrap failed"
    boot.flush()

    mesh = pstreams.make_mesh(n_dev, axis="stream")
    bt = BatchedTracker(cfg, S, mesh=mesh, kf_interval=5)
    ms_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (S,) + x.shape).copy(), boot.ms)
    bt.bootstrap(pstreams.shard_streams(mesh, ms_b),
                 jnp.broadcast_to(boot.T_last, (S, 4, 4)))

    img = synthetic.render(scene, Ts_gt[i])
    imgs = np.broadcast_to(img, (S,) + img.shape)
    T = sc = None
    for _ in range(6):  # warmup: both kf/track branches compile
        T, sc = bt.step(imgs)
    jax.block_until_ready(sc)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        T, sc = bt.step(imgs)
    jax.block_until_ready(sc)
    dt = (time.perf_counter() - t0) / n_steps
    sc0 = np.asarray(sc)
    assert (sc0 == sc0[0]).all(), "streams diverged across devices"
    print(json.dumps({
        "devices": n_dev, "streams": S,
        "step_ms": round(dt * 1e3, 1),
        "aggregate_fps": round(S / dt, 1),
        "T00": [round(float(v), 6) for v in np.asarray(T)[0, :3, 3]],
    }))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--child", type=int, default=0)
    args = ap.parse_args()
    if args.child:
        child(args.child, args.steps)
        return 0

    rows = []
    for n in args.devices:
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS=f"--xla_force_host_platform_device_count={n}")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(n), "--steps", str(args.steps)],
            env=env, capture_output=True, text=True, timeout=3600)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not line:
            sys.stderr.write(p.stderr[-2000:])
            raise RuntimeError(f"child failed for {n} devices")
        row = json.loads(line[-1])
        rows.append(row)
        print(json.dumps(row), flush=True)

    # same inputs must give the same pose regardless of device count
    for r in rows[1:]:
        assert r["T00"] == rows[0]["T00"], \
            f"trajectory differs at {r['devices']} devices"
    print("\ndevices  step_ms  aggregate_fps")
    for r in rows:
        print(f"{r['devices']:7d}  {r['step_ms']:7.1f}  "
              f"{r['aggregate_fps']:13.1f}")
    print("pose identical across device counts: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
