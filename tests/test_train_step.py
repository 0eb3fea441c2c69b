"""End-to-end jitted train-step tests on synthetic data (small shapes)."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dino_tracker_tpu.config import TrainConfig
from dino_tracker_tpu.models.tracker import TrackerConfig
from dino_tracker_tpu.structures import BBData
from dino_tracker_tpu.training import sampler as sampler_lib
from dino_tracker_tpu.training import train as train_lib

RNG = np.random.default_rng(3)

T, H, W, C = 6, 70, 98, 24


def make_video_data(t=T, h=H, w=W, c=C, n_traj=120, bb_cap=32):
    tcfg = TrackerConfig(video_h=h, video_w=w, delta_channels=(3, 8, 8, 8, c))
    hp, wp = tcfg.feat_hw
    video = jnp.asarray(RNG.random((t, 3, h, w), dtype=np.float32))
    dino = jnp.asarray(RNG.standard_normal((t, c, hp, wp)).astype(np.float32))
    fg_masks = jnp.asarray(
        (RNG.random((t, h, w)) < 0.3).astype(np.float32) * 255)

    traj = RNG.random((n_traj, t, 2)).astype(np.float32) * [w - 1, h - 1]
    vis = RNG.random((n_traj, t)) < 0.8
    traj[~vis] = np.nan
    fg_bank = sampler_lib.build_bank(traj)
    traj2 = RNG.random((n_traj, t, 2)).astype(np.float32) * [w - 1, h - 1]
    bg_bank = sampler_lib.build_bank(traj2)

    nvalid = RNG.integers(5, bb_cap, (t, t))
    valid = np.arange(bb_cap)[None, None, :] < nvalid[..., None]
    bb = BBData(
        source_coords=jnp.asarray(RNG.random((t, t, bb_cap, 2)).astype(np.float32) * [w - 1, h - 1]),
        target_coords=jnp.asarray(RNG.random((t, t, bb_cap, 2)).astype(np.float32) * [w - 1, h - 1]),
        cos_sims=jnp.asarray(RNG.random((t, t, bb_cap)).astype(np.float32)),
        r=jnp.asarray(RNG.random((t, t, bb_cap)).astype(np.float32)),
        valid=jnp.asarray(valid),
    )
    data = train_lib.VideoData(video, dino, fg_masks, bb, fg_bank, bg_bank)
    return tcfg, data


CFG = TrainConfig(train_batch_size=32, batch_n_frames=4,
                  cyc_n_frames=2, cyc_batch_size_per_frame=16,
                  cl_n_frames=2, cl_points_per_pair=16,
                  total_iterations=10, checkpoint_interval=1000)


@pytest.mark.slow
@pytest.mark.parametrize("use_cyc,use_cl_ref", [(False, False), (True, True)])
def test_train_step_runs_and_is_finite(use_cyc, use_cl_ref):
    tcfg, data = make_video_data()
    state = train_lib.init_train_state(jax.random.PRNGKey(0), CFG, tcfg)
    step = train_lib.make_train_step(CFG, tcfg, use_cyc, use_cl_ref)
    s1, metrics = step(state, data, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite: {v}"
    assert int(s1.step) == 1
    # params updated
    before = np.asarray(state.params["tracker_head"]["conv1"]["w"])
    after = np.asarray(s1.params["tracker_head"]["conv1"]["w"])
    assert np.abs(before - after).max() > 0
    # the zero-init last conv receives gradient on step 1 (earlier layers
    # only unblock once it becomes nonzero — matches torch autograd)
    dd_b = np.asarray(state.params["delta_dino"]["layers"][-1]["conv"]["w"])
    dd_a = np.asarray(s1.params["delta_dino"]["layers"][-1]["conv"]["w"])
    assert np.abs(dd_b - dd_a).max() > 0


@pytest.mark.slow
def test_multi_step_loss_decreases_on_easy_task():
    """Distinct per-position features shared across frames + static
    trajectories -> tracking is solvable; loss_of should drop."""
    t, h, w, c = 5, 70, 98, 16
    tcfg = TrackerConfig(video_h=h, video_w=w, delta_channels=(3, 4, 4, 4, c))
    hp, wp = tcfg.feat_hw
    pos_feat = RNG.standard_normal((c, hp, wp)).astype(np.float32)
    dino = jnp.asarray(np.tile(pos_feat[None], (t, 1, 1, 1)))
    video = jnp.asarray(RNG.random((t, 3, h, w), dtype=np.float32))
    fg_masks = jnp.asarray((RNG.random((t, h, w)) < 0.3).astype(np.float32))

    n_traj = 200
    pts = RNG.random((n_traj, 2)).astype(np.float32) * [w - 1, h - 1]
    traj = np.tile(pts[:, None, :], (1, t, 1))  # static points
    bank = sampler_lib.build_bank(traj)

    bb_cap = 8
    bb = BBData(jnp.zeros((t, t, bb_cap, 2)), jnp.zeros((t, t, bb_cap, 2)),
                jnp.zeros((t, t, bb_cap)), jnp.ones((t, t, bb_cap)),
                jnp.zeros((t, t, bb_cap), bool))
    data = train_lib.VideoData(video, dino, fg_masks, bb, bank, bank)

    cfg = TrainConfig(train_batch_size=64, batch_n_frames=4,
                      cl_n_frames=2, cl_points_per_pair=8)
    state = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, False, False)
    key = jax.random.PRNGKey(42)
    first = None
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step(state, data, sub)
        if i == 0:
            first = float(metrics["loss_of"])
    last = float(metrics["loss_of"])
    assert np.isfinite(last)
    assert last < first, (first, last)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from dino_tracker_tpu.training import checkpoint as ck
    tcfg, data = make_video_data()
    state = train_lib.init_train_state(jax.random.PRNGKey(0), CFG, tcfg)
    step = train_lib.make_train_step(CFG, tcfg, False, False)
    s1, _ = step(state, data, jax.random.PRNGKey(1))
    ck.save_state(str(tmp_path), s1, 7)
    assert ck.get_last_ckpt_iter(str(tmp_path)) == 7
    restored = ck.load_state(str(tmp_path), state)
    np.testing.assert_allclose(
        np.asarray(restored.params["tracker_head"]["conv1"]["w"]),
        np.asarray(s1.params["tracker_head"]["conv1"]["w"]))
    assert int(restored.step) == int(s1.step)


def test_checkpoint_corrupt_newest_falls_back(tmp_path):
    """A process killed mid-save must not poison resume: load_latest skips
    truncated files; explicit-step load still fails hard; save leaves no
    .tmp behind (atomic temp+replace)."""
    from dino_tracker_tpu.training import checkpoint as ck
    tcfg, data = make_video_data()
    state = train_lib.init_train_state(jax.random.PRNGKey(0), CFG, tcfg)
    good = ck.save_state(str(tmp_path), state, 5)
    assert not any(n.endswith(".tmp") for n in os.listdir(tmp_path))
    # simulate a kill mid-write of the newer checkpoint
    with open(good, "rb") as f:
        blob = f.read()
    with open(os.path.join(tmp_path, "state_10.msgpack"), "wb") as f:
        f.write(blob[: len(blob) // 2])
    loaded, it = ck.load_latest(str(tmp_path), state)
    assert it == 5 and loaded is not None
    with pytest.raises(Exception):
        ck.load_state(str(tmp_path), state, 10)


def test_lr_schedule_matches_reference():
    """delta_dino lr = 0.01·0.999^(i//40), head constant (schedulers.py:4-8)."""
    cfg = TrainConfig()
    def dd_lr(count):
        return cfg.lr_delta_dino * cfg.scheduler_gamma ** (count // cfg.apply_scheduler_every)
    assert dd_lr(0) == 0.01
    assert abs(dd_lr(40) - 0.01 * 0.999) < 1e-9
    assert abs(dd_lr(10000) - 0.01 * 0.999 ** 250) < 1e-9


@pytest.mark.slow
def test_train_step_bf16_compute_path():
    """bf16 conv/matmul path runs and yields finite, f32-close losses."""
    import dataclasses
    tcfg, data = make_video_data()
    tcfg_bf16 = dataclasses.replace(tcfg, compute_dtype="bfloat16")
    state = train_lib.init_train_state(jax.random.PRNGKey(0), CFG, tcfg_bf16)
    step = train_lib.make_train_step(CFG, tcfg_bf16, True, True)
    s1, metrics = step(state, data, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # same seed in f32: tracking loss should be close (bf16 noise only)
    state32 = train_lib.init_train_state(jax.random.PRNGKey(0), CFG, tcfg)
    step32 = train_lib.make_train_step(CFG, tcfg, True, True)
    _, m32 = step32(state32, data, jax.random.PRNGKey(1))
    assert abs(float(metrics["loss_of"]) - float(m32["loss_of"])) < 5e-3


def test_trainer_chunk_boundaries():
    """_next_chunk never crosses a phase/log/ckpt boundary and always
    advances."""
    import dataclasses as dc
    from dino_tracker_tpu.training.train import Trainer
    cfg = TrainConfig(total_iterations=10000, steps_per_call=25,
                      apply_cyc_after=5000, apply_cl_ref_after=5000,
                      checkpoint_interval=2500, sampler_batch_iterations=1000)
    t = Trainer.__new__(Trainer)
    t.cfg = cfg
    i = 0
    seen_phase_cross = False
    while i < cfg.total_iterations:
        n = t._next_chunk(i, log_interval=100)
        assert 1 <= n <= 25
        # no chunk crosses the phase boundary
        assert not (i < 5000 < i + n)
        assert not (i < 2500 < i + n and (i // 2500) != ((i + n) // 2500) and (i + n) % 2500 != 0)
        i += n
    assert i == cfg.total_iterations

    # awkward config: boundaries not multiples of steps_per_call
    cfg2 = TrainConfig(total_iterations=103, steps_per_call=25,
                       apply_cyc_after=37, apply_cl_ref_after=41,
                       checkpoint_interval=50, sampler_batch_iterations=7)
    t.cfg = cfg2
    i, chunks = 0, []
    while i < cfg2.total_iterations:
        n = t._next_chunk(i, log_interval=10)
        assert n >= 1
        assert not (i < 37 < i + n)
        assert not (i < 41 < i + n)
        i += n
        chunks.append(n)
    assert i == cfg2.total_iterations
