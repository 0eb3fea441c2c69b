"""CI exercise of scripts/parity_harness.py with random-weight stand-ins.

Validates the harness plumbing end-to-end (checkpoint conversion, feature/
flow parity gates, full preprocess → train → infer → eval) so that the
moment real pretrained weights are mountable the AJ/δ/OA comparison is a
single invocation. The torch-side dumps are stand-ins produced by our own
extractor/flow engine, so the parity gates must PASS exactly.
"""

import json
import os
import pickle
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

H, W, T = 70, 98, 6
MODEL = "dinov2_vits14"


@pytest.fixture(scope="module")
def harness_env(tmp_path_factory):
    import jax.numpy as jnp
    from PIL import Image
    import gen_random_ckpts

    root = tmp_path_factory.mktemp("parity")
    data = root / "0"
    video_dir = data / "video"
    video_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H, W, 3), np.uint8)
    for i in range(T):
        frame = np.roll(base, shift=2 * i, axis=1)
        Image.fromarray(frame).save(video_dir / f"{i:05d}.jpg", quality=95)

    ckpts = root / "ckpts"
    ckpts.mkdir()
    import torch
    torch.save(gen_random_ckpts.raft_state_dict(0), ckpts / "raft.pth")
    np.savez(ckpts / "dino.npz", **gen_random_ckpts.dinov2_npz(MODEL, 0))

    pre_yaml = root / "preprocessing.yaml"
    pre_yaml.write_text(
        f"video_resh: {H}\nvideo_resw: {W}\nraft_iters: 2\n"
        f"threshold: 5.0\ndirect_flow_threshold: 10.0\n"
        f"dino_model_name: {MODEL}\ndino_layer: 5\nmask_dino_layer: 8\n"
        f"bb_max_pairs_per_frame_pair: 64\ndino_bb_nms_topk: 16\n"
        f"compute_dtype: float32\n")
    train_yaml = root / "train.yaml"
    train_yaml.write_text(
        f"video_resh: {H}\nvideo_resw: {W}\ntotal_iterations: 4\n"
        f"checkpoint_interval: 4\ntrain_batch_size: 32\n"
        f"cyc_batch_size_per_frame: 8\ncl_points_per_pair: 8\n"
        f"apply_cyc_after: 2\napply_cl_ref_after: 2\nsteps_per_call: 2\n"
        f"dino_model_name: {MODEL}\nbb_max_pairs_per_frame_pair: 64\n"
        f"compute_dtype: float32\n")

    qp = rng.random((5, 2)) * [W - 1, H - 1]
    bench = {"videos": [{
        "video_idx": 0, "h": H, "w": W,
        "query_points": {0: [list(map(float, p)) for p in qp]},
        "target_points": {0: rng.random((5, T, 2)) * [W - 1, H - 1]},
        "occluded": {0: rng.random((5, T)) < 0.2}}]}
    pkl = root / "benchmark.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(bench, f)

    # "torch-side" dumps: produced by our own stack, so parity is exact
    from dino_tracker_tpu.config import PreprocessConfig
    from dino_tracker_tpu.models.vit_convert import load_dinov2_checkpoint
    from dino_tracker_tpu.models.vit import extract_feature_video
    from dino_tracker_tpu.models.raft import convert_raft_state_dict
    from dino_tracker_tpu.preprocessing.flow import RaftFlowEngine
    from dino_tracker_tpu.utils import video_io

    pcfg = PreprocessConfig.from_yaml(str(pre_yaml))
    video = video_io.load_video(str(video_dir), resize=(H, W))
    vit_params, vit_cfg = load_dinov2_checkpoint(str(ckpts / "dino.npz"), MODEL)
    feats = np.asarray(extract_feature_video(
        vit_params, jnp.asarray(video), vit_cfg, stride=pcfg.dino_stride,
        layer=pcfg.dino_layer))
    np.savez(root / "torch_features.npz", features=feats)

    sd = torch.load(ckpts / "raft.pth", map_location="cpu", weights_only=True)
    eng = RaftFlowEngine(convert_raft_state_dict(sd), video, num_iters=2)
    fwd, _ = eng.adjacent_flows()
    np.savez(root / "torch_flows.npz", flows=fwd)
    return root


def run_harness(argv):
    import parity_harness
    old = sys.argv
    sys.argv = ["parity_harness.py"] + argv
    try:
        with pytest.raises(SystemExit) as e:
            parity_harness.main()
        return e.value.code
    finally:
        sys.argv = old


@pytest.mark.slow
def test_parity_gates_pass_on_standins(harness_env, capsys):
    root = harness_env
    rc = run_harness([
        "--data-path", str(root / "0"),
        "--dino-checkpoint", str(root / "ckpts" / "dino.npz"),
        "--raft-checkpoint", str(root / "ckpts" / "raft.pth"),
        "--torch-features", str(root / "torch_features.npz"),
        "--torch-flows", str(root / "torch_flows.npz"),
        "--preprocess-config", str(root / "preprocessing.yaml"),
    ])
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    assert rc == 0
    stages = {r["stage"]: r for r in out}
    assert stages["feature_parity"]["pass"]
    assert stages["feature_parity"]["min_cos"] >= 0.999
    assert stages["flow_parity"]["pass"]
    assert stages["flow_parity"]["mean_epe"] <= 0.5


@pytest.mark.slow
def test_parity_gate_fails_on_mismatched_features(harness_env, capsys):
    root = harness_env
    with np.load(root / "torch_features.npz") as f:
        feats = f["features"]
    rng = np.random.default_rng(1)
    np.savez(root / "torch_features_bad.npz",
             features=rng.standard_normal(feats.shape).astype(np.float32))
    rc = run_harness([
        "--data-path", str(root / "0"),
        "--dino-checkpoint", str(root / "ckpts" / "dino.npz"),
        "--torch-features", str(root / "torch_features_bad.npz"),
        "--preprocess-config", str(root / "preprocessing.yaml"),
    ])
    assert rc == 1


@pytest.mark.slow
def test_harness_e2e_emits_eval_csv(harness_env, capsys):
    root = harness_env
    rc = run_harness([
        "--data-path", str(root / "0"),
        "--dino-checkpoint", str(root / "ckpts" / "dino.npz"),
        "--raft-checkpoint", str(root / "ckpts" / "raft.pth"),
        "--run-e2e",
        "--preprocess-config", str(root / "preprocessing.yaml"),
        "--train-config", str(root / "train.yaml"),
        "--benchmark-pickle-path", str(root / "benchmark.pkl"),
        "--video-id", "0",
    ])
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    assert rc == 0
    e2e = [r for r in out if r["stage"] == "e2e"][0]
    assert os.path.exists(e2e["csv"])
    m = e2e["metrics"]
    assert 0.0 <= m["occlusion_accuracy"] <= 1.0
    assert 0.0 <= m["average_jaccard"] <= 1.0
