"""Config-5 batch SLAM (BASELINE.json:11): S sequences of full SLAM in
lockstep with batched odometry + batched loop-closure verification.

The equivalence test pins the driver's contract: a batched run over S
sequences reproduces S independent cli/run_slam.py runs (same keyframe
decisions, same accepted loop edges, same trajectories) — the batch
driver mirrors run_slam's per-sequence control plane while replacing
its aligns with mesh-sharded batched programs (dist/batch.py).
"""

import numpy as np
import pytest

from semicp.config import Config, parse_overrides

COMMON = [
    "--synthetic", "40", "--loop", "--n-points", "1000", "--drift", "0.01",
    "--cloud.n_pad=1024", "--cloud.num_classes=8", "--em.max_iters=12",
    "--slam.keyframe_trans=1.5", "--slam.lc_min_gap=10",
    "--slam.lc_max_dist=5.0",
]


@pytest.mark.slow
def test_batch_slam_matches_independent_runs(tmp_path):
    from semicp.cli.run_batch import build_parser, run_batch_slam
    from semicp.cli.run_slam import main as slam_main

    S = 2
    ap = build_parser()
    args, extra = ap.parse_known_args(
        COMMON + ["--slam", "--sequences", str(S)])
    cfg = Config().override(parse_overrides(extra))
    out, trajs, _ = run_batch_slam(args, cfg)

    # the drifted closed loop must actually exercise the SLAM machinery
    # (seed 1 closes its loop under these params; seed 0 legitimately
    # does not — equivalence below covers both behaviors)
    assert all(k >= 3 for k in out["keyframes"]), out["keyframes"]
    assert sum(out["loop_edges"]) >= 1, out["loop_edges"]

    for s in range(S):
        ref = slam_main(COMMON + ["--seed", str(s),
                                  "--out", str(tmp_path / f"ref{s}.txt")])
        assert ref["keyframes"] == out["keyframes"][s], (s, ref["keyframes"],
                                                         out["keyframes"])
        assert ref["loop_edges"] == out["loop_edges"][s], (
            s, ref["loop_edges"], out["loop_edges"])
        ref_traj = np.loadtxt(tmp_path / f"ref{s}.txt").reshape(-1, 3, 4)
        assert len(ref_traj) == len(trajs[s])
        # pointwise poses: batched-vmap vs single-program EM diverge at
        # f32 lsb level; PGO spreads an accepted closure's tiny Z
        # difference over the whole loop, so allow decimeter slack on
        # the ~50 m drifted path — the exact structural equality plus
        # the 1e-2 ATE agreement above are the strong equivalence pins
        diff = np.abs(trajs[s][:, :3, 3] - ref_traj[:, :, 3]).max()
        assert diff < 0.25, f"seq {s}: max translation diff {diff}"
        assert abs(ref["ate_rmse_m"] - out["ate_rmse_m"][s]) < 2e-2, (
            s, ref["ate_rmse_m"], out["ate_rmse_m"][s])
