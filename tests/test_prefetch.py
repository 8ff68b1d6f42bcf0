"""Host prefetch + pipelined dispatch: overlap without semantic change.

The reference overlaps data loading with GPU compute via torch DataLoader
workers (ref data/build.py:95-103).  Here: train/prefetch.py pulls batches
ahead on a thread, and the trainer's epoch loop dispatches group i+1
before reading group i's metrics back.  Both must be order-preserving and
numerically invisible.
"""
import time

import numpy as np
import pytest

from vision_semantic_segmentation_tpu.train.prefetch import PrefetchLoader


class _StubLoader:
    def __init__(self, n=5, delay=0.0):
        self.n = n
        self.delay = delay
        self.epoch = None

    def set_epoch(self, e):
        self.epoch = e

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            if self.delay:
                time.sleep(self.delay)
            yield {"i": np.array(i)}


class TestPrefetchLoader:
    def test_order_preserved_and_restartable(self):
        loader = PrefetchLoader(_StubLoader(7), depth=3)
        for _ in range(2):  # one thread per epoch; re-iterable
            got = [int(b["i"]) for b in loader]
            assert got == list(range(7))

    def test_len_and_set_epoch_delegate(self):
        inner = _StubLoader(4)
        loader = PrefetchLoader(inner, depth=2)
        assert len(loader) == 4
        loader.set_epoch(9)
        assert inner.epoch == 9
        # plain iterables without set_epoch are tolerated
        PrefetchLoader([1, 2], depth=1).set_epoch(0)

    def test_worker_exception_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("decode failed")

        with pytest.raises(RuntimeError, match="decode failed"):
            list(PrefetchLoader(gen(), depth=2))

    def test_bad_depth_rejected(self):
        with pytest.raises(ValueError, match="depth"):
            PrefetchLoader([], depth=0)

    def test_decode_overlaps_consumption(self):
        """Producer 50 ms/batch + consumer 50 ms/batch over 6 batches:
        sequential would be ~600 ms; prefetched runs at ~max(sides) plus
        pipeline fill.  The bound leaves ~40% slack for scheduler jitter
        on the single-core host (CLAUDE.md)."""
        loader = PrefetchLoader(_StubLoader(6, delay=0.05), depth=2)
        t0 = time.perf_counter()
        for _ in loader:
            time.sleep(0.05)
        elapsed = time.perf_counter() - t0
        assert elapsed < 0.50, f"no overlap: {elapsed:.3f}s"

    def test_early_exit_reaps_worker(self):
        """Abandoning iteration (break/exception) must not leak the
        producer thread blocked on a full queue."""
        import threading

        before = {t.name for t in threading.enumerate()}
        loader = PrefetchLoader(_StubLoader(50), depth=2)
        for i, _ in enumerate(loader):
            if i == 1:
                break  # GeneratorExit unwinds the generator
        for _ in range(100):
            alive = [
                t for t in threading.enumerate()
                if t.name == "prefetch" and t.name not in before
            ]
            if not alive:
                break
            time.sleep(0.05)
        assert not alive, "prefetch worker leaked after early exit"


class TestPipelinedEpoch:
    def _cfg(self, k=1):
        from vision_semantic_segmentation_tpu.config import get_train_cfg_defaults

        cfg = get_train_cfg_defaults()
        cfg.MODEL.TYPE = "Dummy"
        cfg.DATASET.NUM_CLASSES = 3
        cfg.OPTIMIZER.TYPE = "SGD"
        cfg.OPTIMIZER.BASE_LR = 0.1
        cfg.SCHEDULER.TYPE = "PolyLRDecay"
        cfg.SCHEDULER.PolyLRDecay.max_iter = 100
        cfg.TRAIN.BATCH_SIZE = 8
        cfg.TRAIN.STEPS_PER_DISPATCH = k
        cfg.RNG_SEED = 5
        return cfg

    def _batches(self, n=4):
        rng = np.random.default_rng(1)
        return [
            {
                "image": rng.standard_normal((8, 16, 16, 3)).astype(np.float32),
                "label": rng.integers(0, 3, (8, 16, 16)).astype(np.int32),
            }
            for _ in range(n)
        ]

    @pytest.mark.parametrize("k", [1, 2])
    def test_pipelined_loop_matches_sync_dispatch(self, tmp_path, k):
        """train_one_epoch (one-deep async pipeline) == synchronous
        per-group dispatch: same params, same losses, same confusion."""
        from vision_semantic_segmentation_tpu.train.trainer import Trainer
        import jax

        batches = self._batches(4)

        t1 = Trainer(self._cfg(k), output_dir=str(tmp_path / "a"))
        meters = t1.train_one_epoch(batches, epoch=0)
        conf1 = t1.train_metric.confusion_matrix.copy()

        t2 = Trainer(self._cfg(k), output_dir=str(tmp_path / "b"))
        t2.train_metric.reset()
        sync_losses = []
        for i in range(0, 4, k):
            sync_losses += t2._dispatch_group(batches[i : i + k])

        assert meters.meters["loss"].count == 4
        np.testing.assert_allclose(
            meters.meters["loss"].global_avg, np.mean(sync_losses), rtol=1e-6
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            t1.state.params,
            t2.state.params,
        )
        np.testing.assert_array_equal(conf1, t2.train_metric.confusion_matrix)

    def test_fit_wraps_loader_with_prefetch(self, tmp_path):
        """fit() honors DATALOADER.PREFETCH_BATCHES (delegating set_epoch)."""
        from vision_semantic_segmentation_tpu.train.trainer import Trainer

        cfg = self._cfg()
        cfg.SCHEDULER.MAX_EPOCH = 1
        cfg.DATALOADER.PREFETCH_BATCHES = 2
        batches = self._batches(2)

        class Loader:
            def __init__(self):
                self.epochs = []

            def set_epoch(self, e):
                self.epochs.append(e)

            def __len__(self):
                return len(batches)

            def __iter__(self):
                yield from batches

        loader = Loader()
        trainer = Trainer(cfg, output_dir=str(tmp_path))
        trainer.fit(train_loader=loader)
        assert loader.epochs == [0]
        assert int(trainer.state.step) == 2
