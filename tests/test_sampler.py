"""Tests for the jitted trajectory sampler."""

import numpy as np
import jax
import jax.numpy as jnp

from dino_tracker_tpu.training import sampler

RNG = np.random.default_rng(11)


def make_trajs(n, t, visible_prob=0.7):
    traj = RNG.random((n, t, 2)).astype(np.float32) * 100
    vis = RNG.random((n, t)) < visible_prob
    # ensure a healthy share have >= 2 visible frames
    traj[~vis] = np.nan
    return traj


def test_build_bank_filters_short_trajectories():
    traj = make_trajs(50, 10)
    traj[0, 1:] = np.nan  # only 1 valid frame -> dropped
    bank = sampler.build_bank(traj)
    valid_counts = np.asarray(bank.valid).sum(axis=1)
    assert (valid_counts[:int(bank.count)] > 1).all()


def test_sample_batch_properties():
    t = 12
    fg = sampler.build_bank(make_trajs(200, t))
    bg = sampler.build_bank(make_trajs(300, t))
    fn = jax.jit(lambda k: sampler.sample_batch(
        k, fg, bg, batch_size=64, num_frames=4, fg_traj_ratio=0.5,
        video_len=t, video_w=854, video_h=476))
    for seed in range(3):
        s = fn(jax.random.PRNGKey(seed))
        frames = np.asarray(s.frames_set_t)
        src = np.asarray(s.source_frame_indices)
        tgt = np.asarray(s.target_frame_indices)
        assert frames.shape == (8,)
        assert ((frames >= 0) & (frames < t)).all()
        assert (src < 8).all() and (tgt < 8).all()
        # source/target indices round-trip to the sampled frames
        t2_abs = np.asarray(s.target_times)
        np.testing.assert_array_equal(frames[tgt], t2_abs.astype(np.int64))
        # t1 != t2 per point (multinomial without replacement)
        t1_norm = np.asarray(s.t1_points)[:, 2]
        t1_abs = np.round((t1_norm + 1) / 2 * (t - 1))
        assert (t1_abs != t2_abs).all()
        # sampled points lie on real trajectories (no padding rows)
        assert np.isfinite(np.asarray(s.t1_points)).all()
        # t2 labels normalized to (-1, 1)
        assert np.abs(np.asarray(s.t2_points_normalized)[:, :2]).max() <= 1.0


def test_sampled_points_match_bank_coords():
    t = 8
    traj = make_trajs(100, t, visible_prob=1.0)  # fully visible
    bank = sampler.build_bank(traj)
    s = sampler.sample_batch(jax.random.PRNGKey(0), bank, bank, 32, 4, 0.5,
                             t, 854, 476)
    # every sampled (x, y) exists somewhere in the bank at the right frame
    coords = np.asarray(bank.coords)  # N×T×2
    t2 = np.asarray(s.target_times).astype(int)
    xy = np.asarray(s.t2_points_normalized)[:, :2]
    xy = (xy + 1) / 2 * np.asarray([853.0, 475.0])
    for i in range(8):  # spot check a few
        frame_coords = coords[:, t2[i], :]
        d = np.abs(frame_coords - xy[i]).sum(axis=1)
        assert d.min() < 1e-3


def test_sample_batch_bank_smaller_than_batch():
    """Banks with fewer rows than the point budget wrap around instead of
    crashing (real failure: 66 surviving trajectories vs batch 256)."""
    t = 10
    fg = sampler.build_bank(make_trajs(7, t, visible_prob=1.0))
    bg = sampler.build_bank(make_trajs(5, t, visible_prob=1.0))
    s = jax.jit(lambda k: sampler.sample_batch(
        k, fg, bg, batch_size=64, num_frames=4, fg_traj_ratio=0.5,
        video_len=t, video_w=100, video_h=100))(jax.random.PRNGKey(0))
    assert s.t1_points.shape == (64, 3)
    assert np.isfinite(np.asarray(s.t1_points)).all()
    assert np.isfinite(np.asarray(s.t2_points_normalized)).all()


def test_resolve_fg_batch_empty_banks():
    t = 10
    full = sampler.build_bank(make_trajs(20, t, visible_prob=1.0))
    empty = sampler.build_bank(np.full((0, t, 2), np.nan, np.float32))
    assert sampler.resolve_fg_batch(full, full, 64, 0.5) == 32
    assert sampler.resolve_fg_batch(empty, full, 64, 0.5) == 0
    assert sampler.resolve_fg_batch(full, empty, 64, 0.5) == 64
    try:
        sampler.resolve_fg_batch(empty, empty, 64, 0.5)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_sample_batch_one_empty_bank():
    """Full batch routed to the non-empty side (empty side gets batch=0)."""
    t = 10
    full = sampler.build_bank(make_trajs(30, t, visible_prob=1.0))
    empty = sampler.build_bank(np.full((0, t, 2), np.nan, np.float32))
    s = sampler.sample_batch(jax.random.PRNGKey(1), full, empty, 32, 4, 0.5,
                             t, 100, 100, fg_batch=32)
    assert s.t1_points.shape == (32, 3)
    assert np.isfinite(np.asarray(s.t1_points)).all()


def test_bank_rotator_windows_and_advances():
    t = 6
    traj = make_trajs(50, t, visible_prob=1.0)
    rot = sampler.BankRotator(traj, traj, window=20)
    fg, bg = rot.current()
    assert fg.coords.shape == (20, t, 2)
    assert int(fg.count) == 20
    first = np.asarray(fg.coords[:, 0, 0]).copy()
    fg2, _ = rot.advance()
    assert fg2.coords.shape == (20, t, 2)
    second = np.asarray(fg2.coords[:, 0, 0])
    assert not np.allclose(first, second)  # different window
    # small sets are padded, count reflects real rows
    rot_small = sampler.BankRotator(traj[:5], traj[:5], window=20)
    fg3, _ = rot_small.current()
    assert fg3.coords.shape == (20, t, 2)
    assert int(fg3.count) == 5
