"""Weight-port goldens at the REAL checkpoint layouts.

Locks the two state-dict converters (models/vit_convert.py,
models/raft.py convert_raft_state_dict) against regressions at the exact
layouts of the published checkpoints, so a one-shot run with real pretrained
weights can't be burned by a transpose/key-mapping bug:

- ViT-L/14: a full-size torch DINOv2 mirror generates a real-layout state
  dict; our converter + forward must match the torch forward numerically
  (true cross-framework parity — the strongest oracle available in-env).
- RAFT-large: torchvision is absent in-env, so the princeton-vl layout is
  locked with a checked-in fixture (tests/fixtures/raft_realscale_golden.npz,
  regenerate with scripts/gen_raft_golden.py): the deterministic state dict's
  key manifest and the converted forward's flow output must both reproduce.
"""

import math
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dino_tracker_tpu.models import raft
from dino_tracker_tpu.models import vit as jvit
from dino_tracker_tpu.models.vit import ViTConfig
from dino_tracker_tpu.models.vit_convert import convert_dinov2_state_dict

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "raft_realscale_golden.npz")


@pytest.mark.slow
def test_vitl14_real_layout_forward_parity():
    """ViT-L/14 (1024-d, 24 blocks, 16 heads, 37×37 pretrain grid) state
    dict through the converter matches the torch mirror's forward at the
    production facet/layers — the real-layout golden VERDICT r2 item 7."""
    torch = pytest.importorskip("torch")
    from test_vit import TorchDinoV2  # the suite's torch DINOv2 mirror

    cfg = ViTConfig.for_model("dinov2_vitl14")
    torch.manual_seed(0)
    tmodel = TorchDinoV2(cfg, stride=7)
    tmodel.eval()
    params = convert_dinov2_state_dict(tmodel.state_dict_dinov2(), cfg)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 3, 42, 56)).astype(np.float32)  # grid 5×7
    with torch.no_grad():
        ref_layers = tmodel(torch.from_numpy(img), return_layers=[15, 23])

    outs, grid_hw = jvit.forward_features(params, jnp.asarray(img), cfg,
                                          stride=7, layers=[15, 23],
                                          facet="tokens", attn_impl="xla")
    assert grid_hw == (5, 7)
    for ours, ref in zip(outs, ref_layers):
        ref = ref.numpy()
        scale = np.abs(ref).mean()
        np.testing.assert_allclose(np.asarray(ours) / scale, ref / scale,
                                   atol=2e-3)


def _raft_golden_inputs():
    rng = np.random.default_rng(1)
    img1 = rng.random((1, 3, 48, 64), dtype=np.float64).astype(np.float32)
    img2 = rng.random((1, 3, 48, 64), dtype=np.float64).astype(np.float32)
    return img1, img2


def test_raft_real_layout_converter_golden():
    """Deterministic princeton-vl-layout state dict -> converter -> 4-iter
    forward must reproduce the checked-in fixture (key manifest + flow)."""
    if not os.path.exists(FIXTURE):
        pytest.fail("fixture missing — run scripts/gen_raft_golden.py")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    from gen_random_ckpts import raft_state_dict

    sd = raft_state_dict(seed=0)
    with np.load(FIXTURE, allow_pickle=False) as fx:
        want_keys = [str(k) for k in fx["keys"]]
        want_shapes = [str(s) for s in fx["shapes"]]
        want_flow = fx["flow"]

    got_keys = sorted(sd)
    got_shapes = [",".join(map(str, tuple(np.asarray(sd[k]).shape)))
                  for k in got_keys]
    assert want_keys == [str(k) for k in got_keys], \
        "princeton-vl key manifest changed"
    assert want_shapes == got_shapes, "state-dict shapes changed"

    params = raft.convert_raft_state_dict(sd)
    img1, img2 = _raft_golden_inputs()
    flow = raft.raft_forward(params, jnp.asarray(img1), jnp.asarray(img2),
                             num_iters=4)
    np.testing.assert_allclose(np.asarray(flow), want_flow, atol=5e-4,
                               err_msg="converter+forward no longer "
                                       "reproduces the golden flow")
