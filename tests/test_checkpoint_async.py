"""AsyncSaver: background checkpoint writes land atomically and failures
surface at join() (training/checkpoint.py; used by Trainer.train to overlap
the full-state fetch with the next chunks' dispatches)."""

import numpy as np
import pytest

from dino_tracker_tpu.training import checkpoint as ckpt_lib


def test_async_saver_roundtrip(tmp_path):
    saver = ckpt_lib.AsyncSaver()
    state = {"w": np.arange(5, dtype=np.float32), "step": np.int32(7)}
    saver.save(str(tmp_path), state, 7)
    saver.save(str(tmp_path), {**state, "step": np.int32(9)}, 9)
    saver.join()
    template = {"w": np.zeros(5, np.float32), "step": np.int32(0)}
    loaded, step = ckpt_lib.load_latest(str(tmp_path), template)
    assert step == 9
    np.testing.assert_array_equal(loaded["w"], state["w"])
    assert ckpt_lib.get_last_ckpt_iter(str(tmp_path)) == 9


def test_async_saver_reraises_writer_failure(tmp_path):
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("x")  # makedirs(<file>) raises
    saver = ckpt_lib.AsyncSaver()
    saver.save(str(blocker), {"w": np.zeros(1)}, 1)
    with pytest.raises(FileExistsError):
        saver.join()
    saver.join()  # idempotent after drain
