"""SLAM checkpoint/resume: crash after a checkpoint, resume, same answer
(SURVEY.md §5 "Checkpoint / resume" + failure recovery)."""

import numpy as np

from semicp.cli.run_slam import main as slam_main


def test_slam_resume_matches_clean_run(tmp_path):
    common = [
        "--synthetic", "24", "--n-points", "700",
        "--cloud.n_pad=1024", "--cloud.num_classes=8", "--em.max_iters=10",
        "--slam.keyframe_trans=1.2", "--slam.checkpoint_every=2",
    ]
    # clean full run
    clean = slam_main(common + ["--out", str(tmp_path / "clean.txt")])

    # "crashed" run: only 14 frames get processed, checkpoints written
    slam_main(common[:1] + ["14"] + common[2:] + [
        "--out", str(tmp_path / "crash.txt"),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ])
    # resume to the full 24 frames from the latest checkpoint
    resumed = slam_main(common + [
        "--out", str(tmp_path / "resumed.txt"),
        "--checkpoint-dir", str(tmp_path / "ckpt"), "--resume",
    ])

    a = np.loadtxt(tmp_path / "clean.txt")
    b = np.loadtxt(tmp_path / "resumed.txt")
    assert a.shape == b.shape == (24, 12)
    # resumed trajectory tracks the clean one (identical inputs; float
    # noise + which frames hit checkpoints may differ slightly)
    tdiff = np.linalg.norm(
        a.reshape(-1, 3, 4)[:, :, 3] - b.reshape(-1, 3, 4)[:, :, 3], axis=1)
    assert tdiff.max() < 0.05, tdiff.max()
    assert resumed["ate_rmse_m"] < clean["ate_rmse_m"] + 0.05
