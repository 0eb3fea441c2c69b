"""RAFT component parity tests (torch mirrors) + end-to-end smoke."""

import pytest
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dino_tracker_tpu.models import raft

RNG = np.random.default_rng(23)


def test_instance_norm_matches_torch():
    x = RNG.standard_normal((2, 5, 6, 8)).astype(np.float32)  # NHWC
    ours = raft.instance_norm(jnp.asarray(x))
    ref = F.instance_norm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(ours),
                               np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               atol=1e-5)


def test_corr_pyramid_and_lookup():
    """Correlation volume + windowed lookup vs a direct torch computation."""
    b, h, w, c = 1, 8, 10, 16
    f1 = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    pyramid = raft.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    assert len(pyramid) == 4
    # level 0 correlation parity
    t1 = torch.from_numpy(f1).reshape(b, h * w, c)
    t2 = torch.from_numpy(f2).reshape(b, h * w, c)
    ref_corr = torch.einsum("bnc,bmc->bnm", t1, t2) / np.sqrt(c)
    np.testing.assert_allclose(np.asarray(pyramid[0]).reshape(b, h * w, h, w),
                               ref_corr.reshape(b, h * w, h, w).numpy(),
                               atol=1e-4)
    # level 1 is a 2×2 average pool of level 0's target dims
    ref_l1 = F.avg_pool2d(ref_corr.reshape(b * h * w, 1, h, w), 2)
    np.testing.assert_allclose(np.asarray(pyramid[1]), ref_l1.numpy(),
                               atol=1e-4)

    # full window lookup vs the princeton-vl CorrBlock convention
    # (delta = stack(meshgrid(dy, dx)) with the FIRST output as x offset)
    coords_np = np.asarray(raft._coords_grid(b, h, w)) + 0.3  # off-grid
    out = raft.corr_lookup(pyramid, raft._coords_grid(b, h, w) + 0.3)
    assert out.shape == (b, h, w, 324)

    r = raft.CORR_RADIUS
    dxy = torch.linspace(-r, r, 2 * r + 1)
    delta = torch.stack(torch.meshgrid(dxy, dxy, indexing="ij"), dim=-1)
    ref_vol = ref_corr.reshape(b * h * w, 1, h, w)
    centroid = torch.from_numpy(coords_np).permute(0, 2, 3, 1).reshape(
        b * h * w, 1, 1, 2)
    coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
    xg = 2 * coords_lvl[..., 0] / (w - 1) - 1
    yg = 2 * coords_lvl[..., 1] / (h - 1) - 1
    sampled = F.grid_sample(ref_vol, torch.stack([xg, yg], dim=-1),
                            align_corners=True)
    ref_l0 = sampled.view(b, h, w, -1)
    np.testing.assert_allclose(np.asarray(out)[..., :81], ref_l0.numpy(),
                               atol=1e-4)


def test_convex_upsample_matches_torch_unfold():
    b, h, w = 2, 4, 5
    flow = RNG.standard_normal((b, h, w, 2)).astype(np.float32)
    mask = RNG.standard_normal((b, h, w, 9 * 64)).astype(np.float32)
    # NB our mask layout is h×w×(9·8·8) reshaped to (9, 8, 8)
    ours = raft.convex_upsample(jnp.asarray(flow), jnp.asarray(mask))

    tflow = torch.from_numpy(np.transpose(flow, (0, 3, 1, 2)))
    tmask = torch.from_numpy(np.transpose(mask, (0, 3, 1, 2)))
    tmask = tmask.view(b, 1, 9, 8, 8, h, w)
    tmask = torch.softmax(tmask, dim=2)
    up_flow = F.unfold(8 * tflow, [3, 3], padding=1)
    up_flow = up_flow.view(b, 2, 9, 1, 1, h, w)
    up_flow = torch.sum(tmask * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
    ref = up_flow.reshape(b, 2, 8 * h, 8 * w)
    np.testing.assert_allclose(np.asarray(ours),
                               np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               atol=1e-4)


def test_sep_conv_gru_matches_torch():
    params = raft.init_raft(jax.random.PRNGKey(0))["update"]["gru"]
    b, h, w = 1, 6, 7
    hs = RNG.standard_normal((b, h, w, 128)).astype(np.float32)
    xs = RNG.standard_normal((b, h, w, 256)).astype(np.float32)  # ctx+motion
    ours = raft._sep_conv_gru(params, jnp.asarray(hs), jnp.asarray(xs))

    def tconv(p, x, pad):
        wgt = torch.from_numpy(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)).copy())
        return F.conv2d(x, wgt, torch.from_numpy(np.asarray(p["b"]).copy()),
                        padding=pad)

    th = torch.from_numpy(np.transpose(hs, (0, 3, 1, 2)))
    tx = torch.from_numpy(np.transpose(xs, (0, 3, 1, 2)))
    hx = torch.cat([th, tx], dim=1)
    z = torch.sigmoid(tconv(params["convz1"], hx, (0, 2)))
    r = torch.sigmoid(tconv(params["convr1"], hx, (0, 2)))
    q = torch.tanh(tconv(params["convq1"], torch.cat([r * th, tx], 1), (0, 2)))
    th = (1 - z) * th + z * q
    hx = torch.cat([th, tx], dim=1)
    z = torch.sigmoid(tconv(params["convz2"], hx, (2, 0)))
    r = torch.sigmoid(tconv(params["convr2"], hx, (2, 0)))
    q = torch.tanh(tconv(params["convq2"], torch.cat([r * th, tx], 1), (2, 0)))
    ref = (1 - z) * th + z * q
    np.testing.assert_allclose(np.asarray(ours),
                               np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               atol=1e-4)


def test_raft_forward_smoke():
    params = raft.init_raft(jax.random.PRNGKey(1))
    img1 = jnp.asarray(RNG.random((2, 3, 64, 80), dtype=np.float32))
    img2 = jnp.asarray(RNG.random((2, 3, 64, 80), dtype=np.float32))
    flow = raft.raft_forward(params, img1, img2, num_iters=3)
    assert flow.shape == (2, 2, 64, 80)
    assert np.isfinite(np.asarray(flow)).all()


def test_input_padder_matches_reference():
    x = jnp.asarray(RNG.random((1, 3, 30, 41), dtype=np.float32))
    p = raft.InputPadder(x.shape)
    padded = p.pad(x)
    assert padded.shape[-2] % 8 == 0 and padded.shape[-1] % 8 == 0
    back = p.unpad(padded)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
    # replicate semantics at the border
    tx = torch.from_numpy(np.asarray(x))
    pad_ht = (((30 // 8) + 1) * 8 - 30) % 8
    pad_wd = (((41 // 8) + 1) * 8 - 41) % 8
    tpad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
    ref = F.pad(tx, tpad, mode="replicate")
    np.testing.assert_allclose(np.asarray(padded), ref.numpy())


def test_flow_engine_encode_once_matches_per_pair_forward():
    """The O(T) hoisted-encoder engine must emit the same flows as running
    the full raft_forward per pair (the reference's naive scheme)."""
    from dino_tracker_tpu.preprocessing.flow import RaftFlowEngine

    params = raft.init_raft(jax.random.PRNGKey(3))
    t, h, w = 5, 30, 41
    video = RNG.random((t, 3, h, w)).astype(np.float32)
    eng = RaftFlowEngine(params, video, num_iters=2, pair_batch=3,
                         encode_batch=2)
    idx_a = np.array([0, 1, 2, 3, 0, 0])
    idx_b = np.array([1, 2, 3, 4, 2, 4])
    ours = eng._run_pairs(idx_a, idx_b)

    padder = raft.InputPadder(video.shape)
    padded = np.asarray(padder.pad(jnp.asarray(video)))
    for i, (a, b) in enumerate(zip(idx_a, idx_b)):
        ref = padder.unpad(raft.raft_forward(
            params, jnp.asarray(padded[a:a + 1]), jnp.asarray(padded[b:b + 1]),
            num_iters=2))
        np.testing.assert_allclose(ours[i], np.asarray(ref)[0], atol=2e-4,
                                   err_msg=f"pair {a}->{b}")


@pytest.mark.slow
def test_flow_engine_mesh_matches_single_device():
    """Pair-axis sharding over an 8-device CPU mesh must not change flows."""
    from dino_tracker_tpu.parallel.mesh import make_mesh
    from dino_tracker_tpu.preprocessing.flow import RaftFlowEngine

    params = raft.init_raft(jax.random.PRNGKey(4))
    t, h, w = 4, 30, 41
    video = RNG.random((t, 3, h, w)).astype(np.float32)
    base = RaftFlowEngine(params, video, num_iters=2)
    sharded = RaftFlowEngine(params, video, num_iters=2, mesh=make_mesh(8))
    f1, b1 = base.adjacent_flows()
    f2, b2 = sharded.adjacent_flows()
    np.testing.assert_allclose(f1, f2, atol=2e-4)
    np.testing.assert_allclose(b1, b2, atol=2e-4)


def test_raft_converter_roundtrip():
    """Random params -> princeton-style state dict -> converter -> identical
    forward output."""
    params = raft.init_raft(jax.random.PRNGKey(2))

    sd = {}

    def put_conv(name, p):
        sd["module." + name + ".weight"] = np.transpose(np.asarray(p["w"]),
                                                        (3, 2, 0, 1))
        sd["module." + name + ".bias"] = np.asarray(p["b"])

    def put_bn(name, p):
        sd["module." + name + ".weight"] = np.asarray(p["scale"])
        sd["module." + name + ".bias"] = np.asarray(p["bias"])
        sd["module." + name + ".running_mean"] = np.asarray(p["mean"])
        sd["module." + name + ".running_var"] = np.asarray(p["var"])

    for enc_name, norm in (("fnet", "instance"), ("cnet", "batch")):
        e = params[enc_name]
        put_conv(enc_name + ".conv1", e["conv1"])
        put_conv(enc_name + ".conv2", e["conv2"])
        if norm == "batch":
            put_bn(enc_name + ".norm1", e["norm1"])
        for li in (1, 2, 3):
            for bi in (0, 1):
                bp = f"{enc_name}.layer{li}.{bi}"
                blk = e[f"layer{li}"][bi]
                put_conv(bp + ".conv1", blk["conv1"])
                put_conv(bp + ".conv2", blk["conv2"])
                if norm == "batch":
                    put_bn(bp + ".norm1", blk["norm1"])
                    put_bn(bp + ".norm2", blk["norm2"])
                if "downsample" in blk:
                    put_conv(bp + ".downsample.0", blk["downsample"]["conv"])
                    if norm == "batch":
                        put_bn(bp + ".downsample.1", blk["downsample"]["norm"])
    u = params["update"]
    for k in ("convc1", "convc2", "convf1", "convf2", "conv"):
        put_conv("update_block.encoder." + k, u["enc"][k])
    for k in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        put_conv("update_block.gru." + k, u["gru"][k])
    put_conv("update_block.flow_head.conv1", u["flow_head"]["conv1"])
    put_conv("update_block.flow_head.conv2", u["flow_head"]["conv2"])
    put_conv("update_block.mask.0", u["mask"]["conv1"])
    put_conv("update_block.mask.2", u["mask"]["conv2"])

    converted = raft.convert_raft_state_dict(sd)
    img1 = jnp.asarray(RNG.random((1, 3, 32, 40), dtype=np.float32))
    img2 = jnp.asarray(RNG.random((1, 3, 32, 40), dtype=np.float32))
    a = raft.raft_forward(params, img1, img2, num_iters=2)
    b = raft.raft_forward(converted, img1, img2, num_iters=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_raft_bf16_compute_close_to_f32():
    """The opt-in bf16 path (convs/GRU in bf16, corr volume + coordinate
    accumulation in f32) must stay within a fraction of a pixel of the f32
    flow and emit f32 outputs."""
    params = raft.init_raft(jax.random.PRNGKey(7))
    img1 = jnp.asarray(RNG.random((1, 3, 64, 80), dtype=np.float32))
    img2 = jnp.asarray(RNG.random((1, 3, 64, 80), dtype=np.float32))
    f32 = raft.raft_forward(params, img1, img2, num_iters=4)
    bf16 = raft.raft_forward(params, img1, img2, num_iters=4,
                             compute_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.float32
    err = np.linalg.norm(np.asarray(f32) - np.asarray(bf16), axis=1)
    assert np.isfinite(np.asarray(bf16)).all()
    # random weights produce sub-pixel flows; bf16 noise must stay well
    # below the pipeline's cycle-consistency threshold (1.5 px)
    assert float(err.mean()) < 0.15, float(err.mean())


@pytest.mark.slow
def test_flow_engine_bf16_plumbing():
    from dino_tracker_tpu.preprocessing.flow import RaftFlowEngine

    params = raft.init_raft(jax.random.PRNGKey(9))
    video = RNG.random((3, 3, 30, 41)).astype(np.float32)
    eng = RaftFlowEngine(params, video, num_iters=2,
                         compute_dtype=jnp.bfloat16)
    fwd, bwd = eng.adjacent_flows()
    assert fwd.shape == (2, 2, 30, 41) and np.isfinite(fwd).all()
    ref = RaftFlowEngine(params, video, num_iters=2).adjacent_flows()[0]
    assert float(np.abs(fwd - ref).mean()) < 0.15


def test_direct_flows_fused_matches_legacy_path():
    """The device-resident fused sweep (decode fwd+bwd + cycle mask in one
    jitted batch) must equal running _run_pairs + compute_direct_flow_masks
    separately, and come back padded to t-1 rows."""
    from dino_tracker_tpu.preprocessing.flow import (
        RaftFlowEngine, compute_direct_flow_masks)

    params = raft.init_raft(jax.random.PRNGKey(5))
    t, h, w = 5, 30, 41
    video = RNG.random((t, 3, h, w)).astype(np.float32)
    eng = RaftFlowEngine(params, video, num_iters=2, pair_batch=2)
    start, threshold = 1, 5.0
    dflows, dmasks = eng.direct_flows(start, threshold)
    assert dflows.shape == (t - 1, h, w, 2)
    assert dmasks.shape == (t - 1, h, w)
    n = t - 1 - start
    targets = np.arange(start + 1, t)
    fwd = np.asarray(eng._run_pairs(np.full_like(targets, start), targets))
    bwd = np.asarray(eng._run_pairs(targets, np.full_like(targets, start)))
    ref_flows, ref_masks = compute_direct_flow_masks(fwd, bwd, threshold)
    np.testing.assert_allclose(np.asarray(dflows)[:n], ref_flows, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dmasks)[:n], ref_masks)
    assert not np.asarray(dflows)[n:].any()


@pytest.mark.slow
def test_dual_extraction_with_traceable_decode_matches_fallback():
    """The fully-fused per-start program (direct decode + dual chaining in
    ONE jitted dispatch, via direct_sweep_traceable) must produce the same
    trajectories as the array-based fallback fed by eng.direct_flows."""
    from dino_tracker_tpu.preprocessing import trajectories as traj_lib
    from dino_tracker_tpu.preprocessing.flow import RaftFlowEngine

    params = raft.init_raft(jax.random.PRNGKey(6))
    t, h, w = 5, 30, 41
    video = RNG.random((t, 3, h, w)).astype(np.float32)
    eng = RaftFlowEngine(params, video, num_iters=2, pair_batch=2)
    fwd, bwd = eng.adjacent_flows()
    thr = 1.0

    got_f, got_u = traj_lib.extract_trajectories_dual(
        fwd, bwd, threshold=thr, direct_flow_threshold=2.5,
        min_trajectory_length=2, decode=eng.direct_sweep_traceable())
    want_f, want_u = traj_lib.extract_trajectories_dual(
        fwd, bwd, threshold=thr, direct_flow_threshold=2.5,
        min_trajectory_length=2,
        direct_flow_fn=lambda s: eng.direct_flows(s, thr))

    assert got_f.shape == want_f.shape and got_u.shape == want_u.shape
    np.testing.assert_allclose(got_f, want_f, atol=1e-5)
    np.testing.assert_array_equal(got_u, want_u)


def test_lane_padded_update_block_exact():
    """The lane-aligned motion encoder / flow head / mask head (channels
    zero-padded to 128 multiples, convf1 as extracted patches) must be
    numerically identical to the naive conv composition."""
    from dino_tracker_tpu.models.nn import conv2d

    params = raft.init_raft(jax.random.PRNGKey(11))
    up = params["update"]
    b, h, w = 2, 12, 10
    flow = jnp.asarray(RNG.standard_normal((b, h, w, 2)).astype(np.float32))
    corr = jnp.asarray(RNG.standard_normal((b, h, w, 324)).astype(np.float32))

    def naive_motion(p, flow_nhwc, corr_nhwc):
        cor = jax.nn.relu(conv2d(corr_nhwc, p["convc1"]))
        cor = jax.nn.relu(conv2d(cor, p["convc2"], padding=1))
        flo = jax.nn.relu(conv2d(flow_nhwc, p["convf1"], padding=3))
        flo = jax.nn.relu(conv2d(flo, p["convf2"], padding=1))
        out = jax.nn.relu(conv2d(jnp.concatenate([cor, flo], -1), p["conv"],
                                 padding=1))
        return jnp.concatenate([out, flow_nhwc], axis=-1)

    ours = raft._motion_encoder(up["enc"], flow, corr)
    ref = naive_motion(up["enc"], flow, corr)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    net = jnp.asarray(RNG.standard_normal((b, h, w, 128)).astype(np.float32))
    ours_fh = raft._flow_head(up["flow_head"], net)
    ref_fh = conv2d(jax.nn.relu(conv2d(net, up["flow_head"]["conv1"],
                                       padding=1)),
                    up["flow_head"]["conv2"], padding=1)
    np.testing.assert_allclose(np.asarray(ours_fh), np.asarray(ref_fh),
                               atol=2e-5)


def test_corr_lookup_einsum_matches_gather():
    """The TPU-default einsum lookup (one-hot contractions, no volume
    padding) must equal the gather path exactly — including windows
    partially and fully outside the volume (grid_sample zeros padding),
    for both the raw-einsum and kernel-padded resident layouts."""
    b, h, w, c = 2, 7, 9, 8
    f1 = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    pyramid = raft.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    # off-grid coords with far out-of-bounds entries in every direction
    coords = np.array(raft._coords_grid(b, h, w), np.float32)
    coords += RNG.normal(0, 1.3, coords.shape).astype(np.float32)
    coords[0, :, 0, 0] = -14.2   # fully outside (negative)
    coords[0, :, -1, -1] = 40.7  # fully outside (positive)
    coords[1, :, 0, 1] = -4.4    # partially outside
    coords = jnp.asarray(coords)

    ref = np.asarray(raft.corr_lookup(pyramid, coords, impl="gather"))

    raw = raft.prepare_pyramid_for_lookup(pyramid, impl="einsum")
    got = np.asarray(raft.corr_lookup(raw, coords, impl="einsum"))
    np.testing.assert_array_equal(got, ref)

    padded = raft.prepare_pyramid_for_lookup(pyramid, impl="gather")
    got2 = np.asarray(raft.corr_lookup(padded, coords, impl="einsum"))
    np.testing.assert_array_equal(got2, ref)
