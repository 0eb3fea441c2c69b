"""Regenerate tests/fixtures/raft_realscale_golden.npz.

The fixture locks the princeton-vl RAFT-large state-dict key manifest and the
convert_raft_state_dict + raft_forward numerics at the real layout (see
tests/test_weight_port_golden.py). Regenerate ONLY when the layout or the
model intentionally changes:

    python scripts/gen_raft_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dino_tracker_tpu.models import raft  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_random_ckpts import raft_state_dict  # noqa: E402


def main():
    sd = raft_state_dict(seed=0)
    keys = sorted(sd)
    shapes = np.asarray([",".join(map(str, tuple(np.asarray(sd[k]).shape)))
                         for k in keys])
    params = raft.convert_raft_state_dict(sd)

    rng = np.random.default_rng(1)
    img1 = rng.random((1, 3, 48, 64), dtype=np.float64).astype(np.float32)
    img2 = rng.random((1, 3, 48, 64), dtype=np.float64).astype(np.float32)
    flow = np.asarray(raft.raft_forward(params, jnp.asarray(img1),
                                        jnp.asarray(img2), num_iters=4))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "raft_realscale_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, keys=np.asarray(keys), shapes=shapes, flow=flow)
    print(f"wrote {out}: {len(keys)} keys, flow {flow.shape}")


if __name__ == "__main__":
    main()
