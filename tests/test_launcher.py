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


def test_run_loop_claims_failures_and_completion(tmp_path, monkeypatch):
    """Two launchers sharing a claim dir process each video exactly once;
    a failing video is claimed (not retried by the peer) but never marked
    done, and the loop continues past it."""
    root = tmp_path / "videos"
    root.mkdir()
    for v in ("0", "1", "2"):
        (root / v).mkdir()
    claim_dir = str(tmp_path / "claims")

    processed = []

    def make(fail=()):
        b = launcher.BenchmarkLauncher(
            dataset_root=str(root), benchmark_pickle_path="x",
            train_config_path="x", preprocess_config_path="x")

        def fake_run_video(video_id):
            processed.append(video_id)
            if video_id in fail:
                raise RuntimeError("boom")

        b.run_video = fake_run_video
        return b

    make(fail=("1",)).run(claim_dir=claim_dir)
    assert processed == ["0", "1", "2"]
    assert launcher.is_done(claim_dir, "0")
    assert not launcher.is_done(claim_dir, "1")  # failed: not done
    assert launcher.is_done(claim_dir, "2")

    # a second host joins: everything claimed -> nothing re-processed,
    # including the failed video (its claim stands until manually cleared)
    make().run(claim_dir=claim_dir)
    assert processed == ["0", "1", "2"]

    # clearing the failed claim lets the next pass retry exactly it
    import os
    os.remove(os.path.join(claim_dir, "1.claim"))
    make().run(claim_dir=claim_dir)
    assert processed == ["0", "1", "2", "1"]
    assert launcher.is_done(claim_dir, "1")
