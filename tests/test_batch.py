"""Multi-sequence batch driver (config 5) on the 8-device CPU mesh."""

from semicp.cli.run_batch import main as batch_main


def test_batch_multi_sequence(tmp_path):
    out = batch_main([
        "--synthetic", "8", "--sequences", "8", "--n-points", "700",
        "--jsonl", str(tmp_path / "m.jsonl"),
        "--cloud.n_pad=1024", "--cloud.num_classes=8", "--em.max_iters=10",
    ])
    assert out["sequences"] == 8
    assert out["aligns_total"] == 8 * 7
    assert out["ate_rmse_mean"] < 0.1, out["ate_rmse_mean"]
    # every sequence individually sane
    assert all(a < 0.2 for a in out["ate_rmse_m"])
