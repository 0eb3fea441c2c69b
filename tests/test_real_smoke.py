"""Real-image, real-program preprocessing smoke on the reference's bundled
horsejump video (reference README "Try it on horsejump" — the no-download
end-to-end path).

tests/test_end_to_end.py covers pipeline mechanics on synthetic frames with a
stubbed flow engine; this test removes that blind spot: real DAVIS JPEG
frames, the REAL RAFT decode program (randomly initialized weights — no
pretrained checkpoints exist in this environment) and a real ViT-S
architecture, end-to-end through trajectories → features → split → best
buddies at reduced resolution, asserting artifact shapes and finiteness.

The reference dataset is read-only: its video/masks folders are symlinked
into a tmp workspace so the pipeline writes artifacts next to them without
touching /root/reference.
"""

import os

import numpy as np
import pytest
import jax

from dino_tracker_tpu.config import PreprocessConfig, add_config_paths
from dino_tracker_tpu.models.raft import init_raft
from dino_tracker_tpu.models.vit import ViTConfig, init_vit
from dino_tracker_tpu.preprocessing.pipeline import PreprocessingPipeline

HORSEJUMP = "/root/reference/dataset/horsejump"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(HORSEJUMP),
                       reason="reference horsejump dataset not present"),
]

T, H, W = 8, 70, 98  # 8 frames at reduced res; feat grid 9x13


def test_real_frames_real_raft_preprocess(tmp_path):
    root = str(tmp_path / "horsejump")
    os.makedirs(root)
    os.symlink(os.path.join(HORSEJUMP, "video"), os.path.join(root, "video"))
    # GT masks exist -> the pipeline skips FG-mask synthesis, like the
    # reference's horsejump run (main_preprocessing.py mask branch)
    os.symlink(os.path.join(HORSEJUMP, "masks"), os.path.join(root, "masks"))

    vit_cfg = ViTConfig.for_model("dinov2_vits14")
    pcfg = PreprocessConfig(
        video_resh=H, video_resw=W, max_frames=T,
        dino_model_name="dinov2_vits14", mask_dino_model_name="dinov2_vits14",
        dino_layer=7, mask_dino_layer=11,
        raft_iters=4,  # CPU-budget; the decode program is the real one
        bb_max_pairs_per_frame_pair=64, dino_bb_nms_topk=20,
        dino_bb_box_size=10)
    pipe = PreprocessingPipeline(
        root, pcfg,
        raft_params=init_raft(jax.random.PRNGKey(0)),
        vit_params=init_vit(jax.random.PRNGKey(1), vit_cfg),
        vit_cfg=vit_cfg, progress=False)
    pipe.run()

    paths = add_config_paths(root)
    for key in ("trajectories_file", "unfiltered_trajectories_file",
                "fg_trajectories_file", "bg_trajectories_file",
                "dino_embed_video_path"):
        assert os.path.exists(paths[key]), key
    assert os.path.exists(os.path.join(paths["dino_bb_dir"],
                                       "dino_best_buddies_filtered.npz"))

    feats = np.load(paths["dino_embed_video_path"])["features"]
    assert feats.shape == (T, 384, 9, 13)
    assert np.isfinite(feats.astype(np.float32)).all()

    # random-weight RAFT flows are garbage numerically but must be finite and
    # chain into trajectories of the contract shape
    trajs = np.load(paths["trajectories_file"])["trajectories"]
    assert trajs.ndim == 3 and trajs.shape[1] == T and trajs.shape[2] == 2
    vis = np.isfinite(trajs).all(axis=2)
    assert vis.any(), "no visible trajectory points at all"
    in_x = (trajs[..., 0][vis] >= -1) & (trajs[..., 0][vis] <= W)
    in_y = (trajs[..., 1][vis] >= -1) & (trajs[..., 1][vis] <= H)
    assert in_x.all() and in_y.all()

    fg = np.load(paths["fg_trajectories_file"])["trajectories"]
    bg = np.load(paths["bg_trajectories_file"])["trajectories"]
    assert fg.shape[0] + bg.shape[0] == trajs.shape[0]
    # the horsejump GT masks mark a real foreground object
    assert fg.shape[0] > 0 and bg.shape[0] > 0

    bb = np.load(os.path.join(paths["dino_bb_dir"],
                              "dino_best_buddies_filtered.npz"))
    assert np.isfinite(bb["source_coords"][bb["valid"]]).all()
