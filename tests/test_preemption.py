"""Preemption-safe training (TRAIN.PREEMPTION_SAFE).

TPU pods preempt with a SIGTERM grace window; the reference has no
failure handling at all (SURVEY.md §5 "failure detection: None" — its
distributed runs hang at barriers).  The TPU-native answer: while
``Trainer.fit`` runs, SIGTERM requests a checkpoint at the next step
boundary; the full TrainState (params / BN stats / optimizer / step /
rng) commits through the crash-safe ``last_checkpoint`` pointer, fit
returns cleanly, and AUTO_RESUME continues MID-EPOCH from the exact
saved step (deterministic loaders replay the skipped batches).

Pinned here:
  * in-process: a mid-epoch preempt + resume reproduces the
    uninterrupted run's final parameters BIT-EXACTLY (the strongest
    form of "same loss trajectory");
  * subprocess: a real SIGTERM kills a training process mid-run, the
    process exits 0 with a committed checkpoint, and a resumed process
    finishes with the uninterrupted run's exact parameters.
"""
import os
import os.path as osp
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from vision_semantic_segmentation_tpu.config import get_train_cfg_defaults
from vision_semantic_segmentation_tpu.train.trainer import Trainer


def _toy_cfg():
    cfg = get_train_cfg_defaults()
    cfg.MODEL.TYPE = "Dummy"
    cfg.DATASET.NUM_CLASSES = 3
    cfg.DATASET.IN_CHANNELS = 3
    cfg.OPTIMIZER.TYPE = "SGD"
    cfg.OPTIMIZER.BASE_LR = 0.05
    cfg.OPTIMIZER.SGD.momentum = 0.9
    cfg.SCHEDULER.TYPE = "PolyLRDecay"
    cfg.SCHEDULER.PolyLRDecay.max_iter = 100
    cfg.SCHEDULER.MAX_EPOCH = 3
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.VALIDATE.PERIOD = 0
    cfg.RNG_SEED = 7
    # prefetch decouples loader consumption from trainer dispatch (the
    # worker runs ~depth batches ahead), so hook counts would not align
    # with state.step; disable it for deterministic preempt points (a
    # dedicated test pins the prefetch composition separately)
    cfg.DATALOADER.PREFETCH_BATCHES = 0
    return cfg


def _toy_data(n_batches=4, batch=4):
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 3, (n_batches * batch, 12, 12)).astype(np.int32)
    images = np.eye(3, dtype=np.float32)[labels] * 3.0
    images += rng.standard_normal(images.shape).astype(np.float32) * 0.1
    return images, labels


class _Loader:
    """Deterministic 4-batch loader with an optional per-batch hook."""

    def __init__(self, hook=None):
        self.images, self.labels = _toy_data()
        self.hook = hook
        self.count = 0

    def set_epoch(self, e):
        pass

    def __len__(self):
        return 4

    def __iter__(self):
        for i in range(4):
            yield {
                "image": self.images[i * 4 : (i + 1) * 4],
                "label": self.labels[i * 4 : (i + 1) * 4],
            }
            self.count += 1
            if self.hook is not None:
                self.hook(self.count)


def _flat_params(state):
    import jax

    return np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(state.params)]
    )


class TestInProcessPreemption:
    def test_mid_epoch_preempt_and_resume_is_bit_exact(self, tmp_path):
        """Preempt at global step 6 (mid-epoch 1 of 3x4 steps); the resumed
        run must (a) restart from exactly step 6 — replaying the epoch's
        first 2 batches without dispatching them — and (b) finish with the
        uninterrupted run's parameters bit-for-bit."""
        # uninterrupted reference
        cfg = _toy_cfg()
        ref = Trainer(cfg, output_dir=str(tmp_path / "ref"))
        ref.fit(train_loader=_Loader())
        assert int(ref.state.step) == 12
        ref_params = _flat_params(ref.state)

        # preempted run: request_preempt after the 6th batch overall
        out = str(tmp_path / "pre")
        t1 = Trainer(cfg, output_dir=out)
        seen = []

        def hook(count):
            seen.append(count)
            if len(seen) == 6:  # epoch 1, batch 2: mid-epoch
                t1.request_preempt()

        t1.fit(train_loader=_Loader(hook=hook))
        assert int(t1.state.step) == 6  # stopped at the step boundary
        assert osp.exists(osp.join(out, "last_checkpoint"))

        # resume: a FRESH Trainer in the same dir continues from step 6
        t2 = Trainer(cfg, output_dir=out)
        t2.fit(train_loader=_Loader())
        assert int(t2.state.step) == 12
        np.testing.assert_array_equal(_flat_params(t2.state), ref_params)

    def test_preempt_before_any_step_saves_step_zero(self, tmp_path):
        cfg = _toy_cfg()
        out = str(tmp_path / "zero")
        t = Trainer(cfg, output_dir=out)
        t.request_preempt()  # before fit: first epoch dispatches nothing
        t.fit(train_loader=_Loader())
        assert int(t.state.step) == 0
        assert osp.exists(osp.join(out, "last_checkpoint"))

    def test_preemption_composes_with_async_checkpoint(self, tmp_path):
        """ASYNC_CHECKPOINT's in-flight epoch-end save must commit before
        the blocking preemption save (Checkpoint.save drains it)."""
        cfg = _toy_cfg()
        cfg.TRAIN.ASYNC_CHECKPOINT = True
        out = str(tmp_path / "async")
        t1 = Trainer(cfg, output_dir=out)

        def hook(count):
            if count == 6:
                t1.request_preempt()

        t1.fit(train_loader=_Loader(hook=hook))
        assert int(t1.state.step) == 6
        # the pointer names an intact checkpoint holding step 6
        t2 = Trainer(cfg, output_dir=out)
        t2.resume()
        assert int(t2.state.step) == 6

    def test_preemption_composes_with_prefetch(self, tmp_path):
        """With PREFETCH_BATCHES > 0 the preempt lands at a
        nondeterministic step (the worker runs ahead of dispatch); the
        contract that must survive is resume-to-bit-exact-final-params."""
        cfg = _toy_cfg()
        cfg.DATALOADER.PREFETCH_BATCHES = 2
        ref = Trainer(cfg, output_dir=str(tmp_path / "ref"))
        ref.fit(train_loader=_Loader())
        ref_params = _flat_params(ref.state)

        out = str(tmp_path / "pre")
        t1 = Trainer(cfg, output_dir=out)

        def hook(count):
            if count == 6:
                t1.request_preempt()

        t1.fit(train_loader=_Loader(hook=hook))
        stopped = int(t1.state.step)
        assert 0 < stopped < 12  # mid-run, wherever the flag landed
        t2 = Trainer(cfg, output_dir=out)
        t2.fit(train_loader=_Loader())
        assert int(t2.state.step) == 12
        np.testing.assert_array_equal(_flat_params(t2.state), ref_params)

    def test_preemption_safe_off_does_not_install_handler(self, tmp_path):
        cfg = _toy_cfg()
        cfg.TRAIN.PREEMPTION_SAFE = False
        before = signal.getsignal(signal.SIGTERM)
        seen_during = []

        t = Trainer(cfg, output_dir=str(tmp_path / "off"))

        def hook(count):
            seen_during.append(signal.getsignal(signal.SIGTERM))

        t.fit(train_loader=_Loader(hook=hook))
        assert all(h is before for h in seen_during)
        assert signal.getsignal(signal.SIGTERM) is before

    def test_handler_installed_and_restored(self, tmp_path):
        cfg = _toy_cfg()
        before = signal.getsignal(signal.SIGTERM)
        handlers = []

        t = Trainer(cfg, output_dir=str(tmp_path / "on"))

        def hook(count):
            handlers.append(signal.getsignal(signal.SIGTERM))

        t.fit(train_loader=_Loader(hook=hook))
        assert handlers and all(h is not before for h in handlers)
        assert signal.getsignal(signal.SIGTERM) is before


_CHILD = """
import os, sys, time
import numpy as np

sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, {testdir!r})
from test_preemption import _toy_cfg, _Loader, _flat_params
from vision_semantic_segmentation_tpu.train.trainer import Trainer

out, heartbeat, params_out = sys.argv[1], sys.argv[2], sys.argv[3]

def beat(count):
    with open(heartbeat, "w") as f:
        f.write(str(count))
    time.sleep(0.25)  # widen the parent's SIGTERM window

trainer = Trainer(_toy_cfg(), output_dir=out)
trainer.fit(train_loader=_Loader(hook=beat))
np.save(params_out, _flat_params(trainer.state))
print("FINAL_STEP", int(trainer.state.step), flush=True)
"""


class TestSigtermSubprocess:
    def test_sigterm_kills_resumes_same_trajectory(self, tmp_path):
        repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
        testdir = osp.dirname(osp.abspath(__file__))
        script = tmp_path / "child.py"
        script.write_text(_CHILD.format(repo=repo, testdir=testdir))
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )

        def run(out, params_name, kill_after=None):
            hb = tmp_path / (params_name + ".hb")
            params = tmp_path / (params_name + ".npy")
            proc = subprocess.Popen(
                [sys.executable, str(script), str(out), str(hb), str(params)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            if kill_after is not None:
                deadline = time.time() + 240
                while time.time() < deadline:
                    try:
                        if hb.exists() and int(hb.read_text() or 0) >= kill_after:
                            break
                    except ValueError:
                        pass
                    time.sleep(0.02)
                else:
                    proc.kill()
                    pytest.fail("child never reached the kill point")
                proc.send_signal(signal.SIGTERM)
            stdout, _ = proc.communicate(timeout=300)
            return proc.returncode, stdout, params

        # uninterrupted reference
        rc, out_a, params_a = run(tmp_path / "ref", "ref")
        assert rc == 0, out_a
        assert "FINAL_STEP 12" in out_a

        # SIGTERM mid-run: clean exit, committed mid-run checkpoint
        rc, out_b, _ = run(tmp_path / "pre", "pre", kill_after=5)
        assert rc == 0, out_b
        step_line = [ln for ln in out_b.splitlines() if "FINAL_STEP" in ln]
        assert step_line, out_b
        step = int(step_line[0].split()[-1])
        assert 5 <= step < 12, out_b
        assert osp.exists(tmp_path / "pre" / "last_checkpoint")

        # resume in a fresh process: finishes with the reference's params
        rc, out_c, params_c = run(tmp_path / "pre", "res")
        assert rc == 0, out_c
        assert "FINAL_STEP 12" in out_c
        np.testing.assert_array_equal(np.load(params_c), np.load(params_a))
