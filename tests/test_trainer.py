"""Trainer tests: loop mechanics, NaN guard, checkpoint resume, mesh DP."""

import os

import jax

jax.config.update('jax_platforms', 'cpu')

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_sound_tpu.parallel import make_mesh
from pytorch_sound_tpu.trainer import LogType, Trainer


class TinyNet(nn.Module):
    dim: int = 8

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim)(x)
        h = nn.relu(h)
        return nn.Dense(1)(h)


class RegressionTrainer(Trainer):
    def forward(self, params, x, y, is_logging=False):
        pred = self.model.apply(params, x)[..., 0]
        loss = jnp.mean((pred - y) ** 2)
        meta = {'loss': (loss, LogType.SCALAR)} if is_logging else {}
        return loss, meta


def make_loader(n_batches=8, batch=16, seed=0):
    rng = np.random.default_rng(seed)
    w = np.arange(4.0) + 1
    data = []
    for _ in range(n_batches):
        x = rng.standard_normal((batch, 4)).astype(np.float32)
        y = (x @ w).astype(np.float32)
        data.append([x, y])
    return data


def make_trainer(tmp_path, max_step=30, seed=11, **kw):
    kw.setdefault('save_interval', 10)
    return RegressionTrainer(
        TinyNet(), optax.adam(3e-2), make_loader(), make_loader(n_batches=2),
        max_step=max_step, valid_max_step=2,
        log_interval=5, save_dir=str(tmp_path), save_prefix='reg', seed=seed, **kw)


def test_trainer_learns_and_checkpoints(tmp_path):
    t = make_trainer(tmp_path, max_step=200, save_interval=100)
    batch0 = [jnp.asarray(a) for a in make_loader()[0]]
    best = t.run()
    assert np.isfinite(best)
    # checkpoints written at the reference layout
    ckpt_dir = os.path.join(str(tmp_path), 'models', 'reg', 'TinyNet')
    files = sorted(os.listdir(ckpt_dir))
    assert 'step_000100.chkpt' in files and 'step_000200.chkpt' in files
    assert os.path.exists(os.path.join(str(tmp_path), 'models', 'reg',
                                       'TinyNet.best.chkpt'))
    # loss went down substantially (initial mse ~ var(y) ~ 30)
    loss0, _ = t.forward(t.params, *batch0)
    assert float(loss0) < 5.0


class CountingTrainer(RegressionTrainer):
    """Counts actually-executed train steps — resume must NOT re-run old ones."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.executed_steps = []

    def train(self, step):
        self.executed_steps.append(step)
        super().train(step)


def make_counting_trainer(tmp_path, max_step, seed=11, **kw):
    kw.setdefault('save_interval', 10)
    return CountingTrainer(
        TinyNet(), optax.adam(3e-2), make_loader(), make_loader(n_batches=2),
        max_step=max_step, valid_max_step=2,
        log_interval=5, save_dir=str(tmp_path), save_prefix='reg', seed=seed, **kw)


def test_trainer_resume(tmp_path):
    t1 = make_counting_trainer(tmp_path, max_step=20)
    t1.run()
    assert t1.executed_steps == list(range(1, 21))
    p1 = np.asarray(jax.tree_util.tree_leaves(t1.params)[0])

    # new trainer resumes from step 20 and executes ONLY steps 21..25
    t2 = make_counting_trainer(tmp_path, max_step=25, seed=99)
    t2.run()
    assert t2.step == 25
    assert t2.executed_steps == list(range(21, 26))
    # it really loaded the old state (seed comes from the checkpoint, not 99)
    assert t2.seed == t1.seed


class StreamRecorder:
    """Loader drawing batches from global np.random, recording each draw —
    the test analog of the dataset's random crop/shuffle stream."""

    def __init__(self, log, batch=16):
        self.log = log
        self.batch = batch

    def __iter__(self):
        w = np.arange(4.0) + 1
        for _ in range(8):
            x = np.random.standard_normal((self.batch, 4)).astype(np.float32)
            y = (x @ w).astype(np.float32)
            self.log.append(float(x.sum()))
            yield [x, y]


def _stream_trainer(tmp_path, log, max_step):
    return RegressionTrainer(
        TinyNet(), optax.adam(3e-2), StreamRecorder(log), make_loader(n_batches=2),
        max_step=max_step, valid_max_step=2, save_interval=5, log_interval=5,
        save_dir=str(tmp_path), save_prefix='reg', seed=7, prefetch_size=0)


def test_resume_reproduces_data_stream(tmp_path):
    """Interrupt+resume replays the exact crop/shuffle stream of an
    uninterrupted run (np.random + jax key state are checkpointed)."""
    full_log = []
    _stream_trainer(tmp_path / 'full', full_log, max_step=20).run()
    assert len(full_log) == 20   # one draw per step, no lookahead

    part_log = []
    _stream_trainer(tmp_path / 'res', part_log, max_step=10).run()
    resumed_log = []
    t = _stream_trainer(tmp_path / 'res', resumed_log, max_step=20)
    t.run()
    assert t.step == 20
    # first draw bootstraps lazy init and is discarded on resume; the rest
    # must equal the uninterrupted run's steps 11..20 exactly
    np.testing.assert_array_equal(resumed_log[1:], full_log[10:20])
    # and the model ends identical to the uninterrupted run
    a = np.asarray(jax.tree_util.tree_leaves(t.params)[0])
    full2_log = []
    tf = _stream_trainer(tmp_path / 'full', full2_log, max_step=20)
    tf._bootstrap()   # just reload the finished run's final checkpoint
    b = np.asarray(jax.tree_util.tree_leaves(tf.params)[0])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_trainer_grad_clip(tmp_path):
    t = make_trainer(tmp_path, max_step=5, grad_clip=0.01, grad_norm=0.5)
    t.run()
    assert t.step == 5


def test_nan_guard_skips_update(tmp_path):
    class NaNTrainer(RegressionTrainer):
        def forward(self, params, x, y, is_logging=False):
            loss, meta = super().forward(params, x, y, is_logging=is_logging)
            # poison the loss at every step
            return loss * jnp.nan, meta

    t = NaNTrainer(
        TinyNet(), optax.adam(1e-2), make_loader(), make_loader(n_batches=2),
        max_step=3, valid_max_step=1, save_interval=100, log_interval=1,
        save_dir=str(tmp_path), save_prefix='nan', seed=3)
    batch = [jnp.asarray(a) for a in make_loader()[0]]
    t._ensure_initialized(batch)
    before = jax.tree_util.tree_leaves(t.params)[0].copy()
    t.train(1)
    after = jax.tree_util.tree_leaves(t.params)[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))


def test_trainer_mesh_data_parallel(tmp_path):
    assert len(jax.devices()) == 8, 'conftest must provide 8 virtual devices'
    mesh = make_mesh()  # 8-way data axis
    t = make_trainer(tmp_path, max_step=10, mesh=mesh)
    best = t.run()
    assert np.isfinite(best)
    # params replicated over the mesh
    leaf = jax.tree_util.tree_leaves(t.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_scheduler_chained(tmp_path):
    sched = optax.piecewise_constant_schedule(1.0, {5: 0.1})
    t = make_trainer(tmp_path, max_step=8, scheduler=sched)
    t.run()
    assert t.step == 8


def test_multihost_data_helpers():
    """Single-process behavior of the multi-host helpers (process_count=1),
    plus explicit-index sharding math."""
    from pytorch_sound_tpu.parallel.data import (global_batches,
                                                 process_shard_indices)
    from pytorch_sound_tpu.parallel import make_mesh

    # strided split covers all rows exactly once across hosts
    parts = [process_shard_indices(10, pi, 4) for pi in range(4)]
    all_idx = sorted(int(i) for p in parts for i in p)
    assert all_idx == list(range(10))

    mesh = make_mesh()
    batches = [[np.ones((8, 4), np.float32), np.arange(8)]]
    (out,) = list(global_batches(batches, mesh))
    assert out[0].shape == (8, 4)
    assert len(out[0].sharding.device_set) == 8   # sharded over the mesh


def test_trainer_remat(tmp_path):
    """jax.checkpoint-wrapped forward trains identically (same seed)."""
    t1 = make_trainer(tmp_path / 'a', max_step=5, seed=21)
    t1.run()
    t2 = make_trainer(tmp_path / 'b', max_step=5, seed=21, remat=True)
    t2.run()
    a = jax.tree_util.tree_leaves(t1.params)[0]
    b = jax.tree_util.tree_leaves(t2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_prefetch_straggler_batch_replicates():
    """Batches whose leading dim doesn't divide the mesh are placed
    replicated (not batch-sharded) instead of crashing."""
    import jax
    import numpy as np
    from pytorch_sound_tpu.parallel import batch_sharding, make_mesh
    from pytorch_sound_tpu.parallel.prefetch import prefetch_to_device

    mesh = make_mesh()          # 8 virtual CPU devices, 'data' axis
    sharding = batch_sharding(mesh)
    batches = [[np.ones((8, 16), np.float32)],     # divisible -> sharded
               [np.ones((3, 16), np.float32)]]     # straggler -> replicated
    out = list(prefetch_to_device(iter(batches), size=2, sharding=sharding))
    assert len(out) == 2
    full, strag = out[0][0], out[1][0]
    assert len(full.sharding.device_set) == 8
    assert not full.sharding.is_fully_replicated
    assert strag.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(strag), batches[1][0])
