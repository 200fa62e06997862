"""Multi-sequence batch odometry/SLAM — config 5 (BASELINE.json:11).

S sequences advance in lockstep; each step aligns S scan pairs as ONE
mesh-sharded batched program (scan-pair DP over the "pairs" axis,
SURVEY.md §2.3): every device runs the full EM alignment for its shard
of sequences. Preprocessing is likewise one vmapped program over the
batch. Host-side per-sequence pose chaining + ATE.

This is the scaling-study driver: aggregate frames/s versus mesh size
is the BASELINE.json:5 efficiency metric (run under a real pod slice;
here it exercises the virtual CPU mesh or the single chip).

Usage:
  python -m semicp.cli.run_batch --synthetic 30 --sequences 8 [--n-points 2000]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from semicp.cli.common import print_result
from semicp.cloud import make_cloud, preprocess_cloud
from semicp.config import Config, parse_overrides
from semicp.dist import batched_align, make_mesh
from semicp.dist.batch import shard_batch
from semicp.utils import MetricsLogger, PhaseTimer


def build_parser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--synthetic", type=int, required=True, help="frames per sequence")
    ap.add_argument("--sequences", type=int, default=0,
                    help="number of sequences (default: one per device)")
    ap.add_argument("--n-points", type=int, default=2000)
    ap.add_argument("--jsonl", default=None)
    return ap


def main(argv=None):
    ap = build_parser()
    args, extra = ap.parse_known_args(argv if argv is not None else sys.argv[1:])
    cfg = Config().override(parse_overrides(extra))

    n_dev = len(jax.devices())
    S = args.sequences or n_dev
    if S % n_dev:
        ap.error(f"--sequences must be a multiple of the {n_dev} devices")
    mesh = make_mesh({"pairs": n_dev})

    # generate S synthetic sequences (frames in sensor frame + GT)
    from semicp.data import make_scene, make_trajectory, render_scan

    timer = PhaseTimer()
    seqs = []
    with timer.phase("generate"):
        for s in range(S):
            rng = np.random.default_rng(s)
            scene, labels = make_scene(rng, n_points=args.n_points * 4, extent=30.0)
            labels = labels - 1
            traj = make_trajectory(args.synthetic, step=0.6, turn=0.05, seed=s)
            frames = [render_scan(rng, scene, labels, p, max_range=25.0,
                                  max_points=args.n_points) for p in traj]
            seqs.append((frames, traj))

    pre_batch = jax.jit(jax.vmap(lambda c: preprocess_cloud(c, cfg.cov)))
    align_b = batched_align(mesh, cfg)

    def stack_clouds(clouds):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *clouds)

    poses = [[np.eye(4)] for _ in range(S)]
    T_rel_prev = np.tile(np.eye(4, dtype=np.float32), (S, 1, 1))
    prev = None
    ml = MetricsLogger(args.jsonl)
    n_aligns = 0
    t_start = time.perf_counter()
    for t in range(args.synthetic):
        with timer.phase("preprocess"):
            raw = stack_clouds([
                make_cloud(seqs[s][0][t][0], seqs[s][0][t][1], n_pad=cfg.cloud.n_pad)
                for s in range(S)
            ])
            batch = pre_batch(raw)
            jax.block_until_ready(batch.cov6)
        if prev is not None:
            with timer.phase("align_batch"):
                src_b, tgt_b, T0_b = (shard_batch(mesh, x)
                                      for x in (batch, prev, jnp.asarray(T_rel_prev)))
                res = align_b(src_b, tgt_b, T0_b)
                jax.block_until_ready(res.T)
            T_rel = np.asarray(res.T, np.float64)
            T_rel_prev = np.asarray(res.T)
            for s in range(S):
                poses[s].append(poses[s][-1] @ T_rel[s])
            n_aligns += S
            ml.log(frame=t, mean_iters=float(np.mean(np.asarray(res.iterations))),
                   mean_cost=float(np.mean(np.asarray(res.cost))))
        prev = batch
    wall = time.perf_counter() - t_start

    from semicp.eval import ate_rmse

    ates = [ate_rmse(np.stack(poses[s]), seqs[s][1][: len(poses[s])]) for s in range(S)]
    out = {
        "sequences": S,
        "frames_per_seq": args.synthetic,
        "aligns_total": n_aligns,
        "aligns_per_s": round(n_aligns / max(wall, 1e-9), 3),
        "devices": n_dev,
        "ate_rmse_m": [round(a, 4) for a in ates],
        "ate_rmse_mean": float(np.mean(ates)),
        "timing": timer.summary(),
    }
    ml.close()
    print_result("run_batch", out)
    print(timer.table(), file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
