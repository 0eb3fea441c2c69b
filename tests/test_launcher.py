"""Work-queue claim semantics for the multi-video launcher."""

from dino_tracker_tpu.parallel import launcher


def test_claims_are_exclusive(tmp_path):
    d = str(tmp_path)
    assert launcher.claim_video(d, "0")
    assert not launcher.claim_video(d, "0")  # second claim loses
    assert launcher.claim_video(d, "1")
    assert not launcher.is_done(d, "0")
    launcher.mark_done(d, "0")
    assert launcher.is_done(d, "0")


def test_video_id_listing(tmp_path):
    for name in ("0", "3", "1", ".hidden"):
        (tmp_path / name).mkdir()
    (tmp_path / "file.txt").write_text("x")
    b = launcher.BenchmarkLauncher(
        dataset_root=str(tmp_path), benchmark_pickle_path="x",
        train_config_path="x", preprocess_config_path="x")
    assert b.video_ids() == ["0", "1", "3"]
