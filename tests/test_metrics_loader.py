"""AUROC metrics, bucketed loader, metrics logger, plateau wiring."""

import os
import pytest

import numpy as np

from decompdiff_tpu.training.loader import BucketedLoader
from decompdiff_tpu.training.metrics import get_auroc, get_bond_auroc
from decompdiff_tpu.utils.metrics_logger import MetricsLogger, ValidationLossTape
from decompdiff_tpu.data.transforms import featurize_sample
from tests.test_data_layer import _raw_sample


def test_auroc_perfect_predictions():
    y = np.array([0, 1, 2, 0, 1, 2, 0, 0])
    probs = np.eye(3)[y] * 0.9 + 0.05
    assert get_auroc(y, probs) > 0.99


def test_auroc_random_predictions():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 4, size=2000)
    probs = rng.dirichlet(np.ones(4), size=2000)
    assert abs(get_auroc(y, probs) - 0.5) < 0.05


def test_bond_auroc_frequency_weighted_with_class_zero():
    """Reference weighting (ref train_diffusion_decomp.py:45-59): every
    class present — INCLUDING class 0 / no-bond — contributes its AUROC
    weighted by frequency, divided by len(y_true)."""
    y = np.array([0, 0, 1, 2, 1, 2] * 10)
    probs = np.eye(5)[y] * 0.8 + 0.04
    assert get_bond_auroc(y, probs) > 0.99

    # class 0 predicted perfectly, classes 1/2 at chance: the weighted
    # average must sit near (2/6)*1.0 + (4/6)*0.5 = 0.667, far from the
    # unweighted classes-1..4 mean (~0.5)
    rng = np.random.default_rng(0)
    y2 = np.array([0, 0, 1, 2, 1, 2] * 200)
    probs2 = np.zeros((len(y2), 5))
    probs2[:, 0] = (y2 == 0) * 0.9 + 0.05          # perfect class-0 score
    probs2[:, 1] = rng.random(len(y2))             # chance
    probs2[:, 2] = rng.random(len(y2))             # chance
    val = get_bond_auroc(y2, probs2)
    assert abs(val - (1.0 / 3 + 0.5 * 2 / 3)) < 0.05, val


def test_bucketed_loader_batches(tmp_path):
    rng = np.random.default_rng(0)
    records = [featurize_sample(_raw_sample(rng, 30 + (i % 3), 9, 2))
               for i in range(12)]

    class ListDS:
        def __len__(self):
            return len(records)

        def __getitem__(self, i):
            return records[i]

    loader = BucketedLoader(ListDS(), range(12), batch_size=4, shuffle=False,
                            infinite=False)
    batches = list(loader)
    assert sum(b.batch_size for b in batches) == 12
    for b in batches:
        assert b.protein_pos.shape[1] == 128  # smallest bucket
    loader.close()


def test_metrics_logger_jsonl(tmp_path):
    ml = MetricsLogger(str(tmp_path), tensorboard=False)
    ml.log(1, 'train', {'loss': 1.5})
    ml.log(2, 'val', {'loss': 1.2, 'auroc': 0.8})
    ml.close()
    import json
    lines = [json.loads(l) for l in
             open(os.path.join(tmp_path, 'metrics.jsonl'))]
    assert lines[0]['tag'] == 'train' and lines[0]['loss'] == 1.5
    assert lines[1]['auroc'] == 0.8


def test_validation_loss_tape():
    tape = ValidationLossTape()
    tape.update({'loss': 2.0}, weight=1)
    tape.update({'loss': 4.0}, weight=3)
    assert tape.averages()['loss'] == 3.5


def test_mol_record_to_xyz():
    from decompdiff_tpu.data.mol import MolRecord
    from decompdiff_tpu.utils.visualize import mol_record_to_xyz
    rec = MolRecord(element=np.array([6, 7]),
                    pos=np.array([[0., 0., 0.], [1.4, 0., 0.]], np.float32),
                    bond_index=np.array([[0, 1], [1, 0]]),
                    bond_type=np.array([1, 1]),
                    aromatic=np.zeros(2, bool))
    xyz = mol_record_to_xyz(rec, 'test')
    lines = xyz.strip().split('\n')
    assert lines[0] == '2' and lines[1] == 'test'
    assert lines[2].startswith('C') and lines[3].startswith('N')


def test_bucketed_loader_counts_poisoned_records():
    """A record whose featurization throws is skipped AND counted by
    exception type (VERDICT.md round-1 item 7 — no silent corpus shrink)."""
    rng = np.random.default_rng(1)
    records = [featurize_sample(_raw_sample(rng, 30, 9, 2)) for _ in range(8)]

    class PoisonedDS:
        def __len__(self):
            return len(records) + 1

        def __getitem__(self, i):
            if i == 3:
                raise KeyError('corrupted store entry')
            return records[i - 1 if i > 3 else i]

    loader = BucketedLoader(PoisonedDS(), range(9), batch_size=4,
                            shuffle=False, infinite=False)
    batches = list(loader)
    assert sum(b.batch_size for b in batches) == 8
    assert loader.skip_counts == {'KeyError': 1}
    loader.close()


def test_bucketed_loader_all_failing_raises():
    """If EVERY sample of an epoch fails to featurize (mis-built store,
    wrong featurize config), the infinite loader must raise through the
    queue instead of spinning at 100% CPU while the consumer blocks
    forever (round-3 hardening)."""
    class BrokenDS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            raise KeyError('bad store entry')

    loader = BucketedLoader(BrokenDS(), range(6), batch_size=4,
                            shuffle=False, infinite=True)
    with pytest.raises(RuntimeError, match='every sample'):
        next(iter(loader))
    assert loader.skip_counts == {'KeyError': 6}
    loader.close()


def test_bucketed_loader_close_mid_stream_joins():
    """close() while the prefetch queue is full must let the producer (and
    its featurize pool) exit instead of blocking forever in queue.put on a
    queue nobody drains (round-3 hardening)."""
    rng = np.random.default_rng(2)
    records = [featurize_sample(_raw_sample(rng, 30, 9, 2)) for _ in range(4)]

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return records[i % 4]

    loader = BucketedLoader(DS(), range(64), batch_size=4, shuffle=False,
                            infinite=True, prefetch=2)
    next(iter(loader))          # producer running, queue refills to full
    loader.close()
    loader._thread.join(timeout=10)
    assert not loader._thread.is_alive()


def test_bucketed_loader_all_oversize_raises():
    """A corpus where every record featurizes fine but exceeds the largest
    bucket must raise instead of re-featurizing the whole corpus forever
    with the consumer blocked on an empty queue (round-3 hardening — the
    oversize-drop twin of the all-failed-epoch raise)."""
    rng = np.random.default_rng(3)
    records = [featurize_sample(_raw_sample(rng, 30, 9, 2)) for _ in range(4)]

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return records[i]

    loader = BucketedLoader(DS(), range(4), batch_size=2, shuffle=False,
                            infinite=True, protein_buckets=(8,),
                            ligand_buckets=(4,), group_buckets=(1,))
    with pytest.raises(RuntimeError, match='oversize'):
        next(iter(loader))
    loader.close()


def test_bucketed_loader_close_unblocks_consumer():
    """close() while a consumer is blocked in __iter__ must end that
    consumer's iteration (the producer exits without the None sentinel, so
    the consumer has to notice the stop itself)."""
    import threading
    import time

    rng = np.random.default_rng(4)
    records = [featurize_sample(_raw_sample(rng, 30, 9, 2)) for _ in range(4)]
    gate = threading.Event()

    class SlowDS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            if i >= 2:
                gate.wait(timeout=5)   # starve the queue after 2 records
                time.sleep(0.01)
            return records[i % 4]

    loader = BucketedLoader(SlowDS(), range(64), batch_size=8, shuffle=False,
                            infinite=True, num_threads=1, prefetch=2)
    done = threading.Event()

    def consume():
        for _ in loader:   # batch_size 8 > 2 ready records: blocks
            pass
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    time.sleep(0.5)
    assert not done.is_set()   # consumer is genuinely blocked
    loader.close()
    gate.set()
    t.join(timeout=10)
    assert done.is_set()


def test_bucketed_loader_sparse_good_records_survive():
    """One good record among oversize ones: the consecutive-oversize
    detector must NOT fire across epoch boundaries (threshold is two
    epochs' worth; a single-epoch threshold false-positived when the good
    record sat first in epoch k and last in epoch k+1)."""
    rng = np.random.default_rng(6)
    good = featurize_sample(_raw_sample(rng, 30, 9, 2))
    big = featurize_sample(_raw_sample(rng, 100, 9, 2))

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return good if i == 0 else big

    loader = BucketedLoader(DS(), range(4), batch_size=1, shuffle=True,
                            seed=3, infinite=True, protein_buckets=(64,),
                            ligand_buckets=(16,), group_buckets=(4,))
    it = iter(loader)
    # several epochs' worth of batches: only the good record fits, one per
    # epoch — the loader must keep yielding, not raise
    for _ in range(4):
        b = next(it)
        assert b.batch_size == 1
    loader.close()
