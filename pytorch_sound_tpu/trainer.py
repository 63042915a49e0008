"""Abstract training runtime: forward() -> (loss, meta) becomes a full loop.

API parity target: `/root/reference/pytorch_sound/trainer.py` — constructor
surface, LogType-typed console/tensorboard logging, NaN-loss step skip,
save/load/resume + best-checkpoint semantics, grad value/norm clipping,
infinite dataset repeat, KeyboardInterrupt -> clean stop returning best loss.

TPU-first re-architecture:
- Functional state: (params, opt_state) pytrees; the user's ``forward`` is a
  pure function of (params, *batch) and the trainer jit-compiles
  value_and_grad + clip + optax update + NaN-guard into ONE device program.
- The NaN skip is a ``jnp.where`` select inside the step (no host sync), and
  loss/meta come back as device arrays only touched on logging steps.
- Data parallelism: pass a ``mesh`` — parameters are replicated, batches
  sharded on the leading axis, and GSPMD inserts the gradient psum over ICI.
- Input pipeline: host batches are double-buffered to HBM via
  ``parallel.prefetch_to_device`` instead of a blocking per-step copy.
- Checkpoints: msgpack state dicts at the reference's file layout
  (``<save_dir>/models/<prefix>/<ModelClass>/step_%06d.chkpt`` + ``.best``);
  resume picks the highest step parsed from the filename (the reference's
  ctime-based discovery is filesystem-fragile — SURVEY.md quirks).

Subclass contract::

    class MyTrainer(Trainer):
        def forward(self, params, *batch, is_logging=False):
            out = self.model.apply(params, batch[0])
            loss = ...
            meta = {'loss': (loss, LogType.SCALAR)} if is_logging else {}
            return loss, meta

        def init_params(self, rng, batch):     # optional; default: first field
            return self.model.init(rng, batch[0])
"""

import enum
import glob
import os
import re
from collections import defaultdict
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from pytorch_sound_tpu.parallel import (batch_sharding, prefetch_to_device,
                                        replicated_sharding)
from pytorch_sound_tpu.settings import SAMPLE_RATE
from pytorch_sound_tpu.utils.commons import log
from pytorch_sound_tpu.utils.plots import imshow_to_buf, plot_to_buf
from pytorch_sound_tpu.utils.tensor import to_numpy


class LogType(enum.Enum):
    SCALAR: int = 1
    IMAGE: int = 2
    ENG: int = 3
    AUDIO: int = 4
    PLOT: int = 5
    TEXT: int = 6


@jax.tree_util.register_pytree_node_class
class _TypedValue:
    """(value, LogType) carrier whose LogType rides as static pytree aux-data,
    so user meta dicts can cross the jit boundary unchanged."""

    def __init__(self, value, log_type: LogType):
        self.value = value
        self.log_type = log_type

    def tree_flatten(self):
        return (self.value,), self.log_type

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


def _wrap_meta(meta):
    return {k: _TypedValue(v, t) for k, (v, t) in meta.items()}


def _unwrap_meta(meta):
    return {k: (tv.value, tv.log_type) for k, tv in meta.items()}


class Trainer:
    """Generalized training helper: override :meth:`forward`, call :meth:`run`.

    Args mirror the reference trainer:
        model: a flax module (hyperparameters bound); its params live in the
            trainer as a pytree
        optimizer: an optax GradientTransformation
        train_dataset / valid_dataset: iterables of batches (lists of arrays)
        max_step / valid_max_step / save_interval / log_interval: loop control
        save_dir / save_prefix: checkpoint + tensorboard log layout
        grad_clip / grad_norm: value clip then global-norm clip (applied in
            that order, matching `trainer.py:184-191`)
        pretrained_path: warm-start checkpoint (model weights only)
        sr: sampling rate for audio logging
        scheduler: optional optax schedule fn(step) -> scale; chained onto the
            optimizer as scale_by_schedule (the optax idiom for per-step
            scheduler.step())
        seed: RNG seed persisted into checkpoints
        params: pre-initialized parameter pytree (else lazy init on first batch)
        mesh: optional jax.sharding.Mesh for data-parallel training
    """

    def __init__(self, model, optimizer, train_dataset, valid_dataset,
                 max_step: int, valid_max_step: int, save_interval: int,
                 log_interval: int, save_dir: str, save_prefix: str = 'save',
                 grad_clip: float = 0.0, grad_norm: float = 0.0,
                 pretrained_path: str = None, sr: int = None,
                 scheduler=None, seed: int = None,
                 params=None, mesh=None, prefetch_size: int = 2,
                 profile_dir: str = None, profile_steps: Tuple[int, int] = (10, 20),
                 remat: bool = False):
        self.pretrained_path = pretrained_path
        self.model = model
        self.scheduler = scheduler
        if scheduler is not None:
            optimizer = optax.chain(optimizer, optax.scale_by_schedule(scheduler))
        self.optimizer = optimizer

        self.mesh = mesh
        self._batch_sharding = batch_sharding(mesh) if mesh is not None else None
        self._repl_sharding = replicated_sharding(mesh) if mesh is not None else None

        self.train_dataset = self.repeat_device(train_dataset, prefetch_size)
        self.valid_dataset = self.repeat_device(valid_dataset, prefetch_size)

        self.step = 0
        self.sr = sr if sr else SAMPLE_RATE
        self.max_step = max_step
        self.save_interval = save_interval
        self.log_interval = log_interval
        self.save_dir = save_dir
        self.save_prefix = save_prefix
        self.grad_clip = grad_clip
        self.grad_norm = grad_norm
        self.valid_max_step = valid_max_step

        self.log_dir = os.path.join(save_dir, 'logs', self.save_prefix)
        self.model_dir = os.path.join(save_dir, 'models')
        os.makedirs(self.model_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)
        self.writer = _make_writer(self.log_dir)

        self.seed = seed if seed else int(np.random.randint(np.iinfo(np.int32).max))
        np.random.seed(self.seed)
        self.rng = jax.random.PRNGKey(self.seed)

        # functional state; created lazily from the first batch unless given
        self.params = params
        self.opt_state = None
        self._pending_batch = None
        self._compiled_train_step = None
        self._compiled_eval_step = None

        self.best_valid_loss = float(np.finfo(np.float32).max)
        self.cur_best_valid_loss = self.best_valid_loss
        self.save_valid_loss = float(np.finfo(np.float32).max)

        # observability: jax.profiler window + rolling step-time metrics
        # (the reference had no tracing/profiling — SURVEY.md §5)
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self._profiling = False
        self._step_times = []
        self._last_step_time = None
        self._warned_channels = set()
        self.remat = remat

    # ------------------------------------------------------------------ user API

    def forward(self, params, *inputs, is_logging: bool = False
                ) -> Tuple[jnp.ndarray, Dict[str, Tuple[Any, LogType]]]:
        """Pure loss function of (params, *batch). Must be jit-traceable.

        :returns: (scalar loss, meta dict of name -> (value, LogType))
        """
        raise NotImplementedError('implement forward() in your Trainer subclass')

    def init_params(self, rng, batch):
        """Initialize model parameters from an example batch.

        Default: ``model.init(rng, batch[0])`` — override when your model
        consumes more than the first field. The init is jitted: eager flax
        init issues one device op PER PARAMETER (hundreds of small
        dispatches — expensive through a remote-dispatch link); one compiled
        program initializes the whole tree in a single dispatch and the
        executable lands in the persistent compile cache.
        """
        return jax.jit(self.model.init)(rng, batch[0])

    # ------------------------------------------------------------------ run loop

    def run(self) -> float:
        try:
            # resume must happen BEFORE the loop range is computed: pull one
            # batch to lazily init params and load the newest checkpoint (the
            # reference loads in __init__, `trainer.py:124`); without this the
            # loop would restart at step 1 and clobber restored state.
            self._bootstrap()
            for i in range(self.step + 1, self.max_step + 1):
                self.step = i
                if i % self.save_interval == 1:
                    log('------------- TRAIN step : %d -------------' % i)
                self.train(i)
                if i % self.save_interval == 0:
                    log('------------- VALID step : %d -------------' % i)
                    self.validate(i)
                    self.save(i)
        except KeyboardInterrupt:
            log('Train is canceled !!')
        return self.best_valid_loss

    # ------------------------------------------------------------------ jit steps

    def _bootstrap(self):
        """Initialize params / resume checkpoints before the run loop starts.

        Draws one batch for shape-driven lazy init. When no checkpoint was
        loaded the batch is kept for step 1 (nothing wasted); when a resume
        happened the batch predates the restored RNG streams, so it is
        discarded — the first resumed step re-draws under the restored state.
        """
        if self.params is not None and self.opt_state is not None:
            return
        batch = next(self.train_dataset)
        loaded = self._ensure_initialized(batch)
        if not loaded:
            self._pending_batch = batch

    def _ensure_initialized(self, batch) -> bool:
        """Lazy param/optimizer init + checkpoint resume. Returns True when a
        checkpoint was loaded."""
        loaded = False
        if self.params is None:
            self.rng, init_rng = jax.random.split(self.rng)
            self.params = self.init_params(init_rng, batch)
            n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
            model_name = type(self.model).__name__ if self.model is not None else 'model'
            log('Model {} was loaded. Total {} params.'.format(model_name, n_params))
        if self.opt_state is None:
            self.opt_state = self.optimizer.init(self.params)
            loaded = self.load()   # resume newest checkpoint if one exists
            if self.step == 0 and self.pretrained_path:
                self.load_pretrained_model()
            if self.mesh is not None:
                self.params = jax.device_put(self.params, self._repl_sharding)
                self.opt_state = jax.device_put(self.opt_state, self._repl_sharding)
        return loaded

    def _clip_grads(self, grads):
        if self.grad_clip:
            c = self.grad_clip
            grads = jax.tree_util.tree_map(lambda g: jnp.clip(g, -c, c), grads)
        if self.grad_norm:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, self.grad_norm / (gnorm + 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        return grads

    def _train_step(self, params, opt_state, batch, is_logging: bool):
        def loss_fn(p):
            loss, meta = self.forward(p, *batch, is_logging=is_logging)
            # wrap here so every output is a valid JAX type (LogType rides as
            # static pytree aux-data) — required by jax.checkpoint below
            return loss, _wrap_meta(meta)

        if self.remat:
            # rematerialize forward activations in the backward pass
            # (jax.checkpoint): trades FLOPs for HBM on long sequences
            loss_fn = jax.checkpoint(loss_fn)

        (loss, meta), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = self._clip_grads(grads)
        updates, new_opt_state = self.optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # NaN/Inf loss -> skip the update entirely (device-side select, no sync)
        ok = jnp.isfinite(loss)
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, params)
        new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old) if isinstance(new, jnp.ndarray) else new,
            new_opt_state, opt_state)
        return new_params, new_opt_state, loss, meta

    def _eval_step(self, params, batch):
        loss, meta = self.forward(params, *batch, is_logging=True)
        return loss, _wrap_meta(meta)

    def _get_train_step(self):
        if self._compiled_train_step is None:
            self._compiled_train_step = jax.jit(
                self._train_step, static_argnames=('is_logging',),
                donate_argnums=(0, 1))
        return self._compiled_train_step

    def _get_eval_step(self):
        if self._compiled_eval_step is None:
            self._compiled_eval_step = jax.jit(self._eval_step)
        return self._compiled_eval_step

    # ------------------------------------------------------------------ phases

    def _maybe_profile(self, step: int):
        if not self.profile_dir:
            return
        start, end = self.profile_steps
        if step == start and not self._profiling:
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
            log('profiler trace started -> {}'.format(self.profile_dir))
        elif step == end and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            log('profiler trace stopped')

    def train(self, step: int):
        import time
        self._maybe_profile(step)
        log_flag = step % self.log_interval == 0
        if self._pending_batch is not None:   # batch drawn during _bootstrap
            batch, self._pending_batch = self._pending_batch, None
        else:
            batch = next(self.train_dataset)
        self._ensure_initialized(batch)

        t0 = time.perf_counter()
        self.params, self.opt_state, loss, meta = self._get_train_step()(
            self.params, self.opt_state, batch, is_logging=log_flag)
        if log_flag:
            jax.block_until_ready(self.params)
        self._step_times.append(time.perf_counter() - t0)
        if len(self._step_times) > 100:
            self._step_times.pop(0)

        if log_flag:
            loss_host = float(loss)
            if loss_host != loss_host:
                log('{} cur step NAN is occured'.format(step))
                return
            meta = _meta_to_host(_unwrap_meta(meta))
            if self._step_times:
                meta['steps_per_sec'] = (
                    1.0 / (sum(self._step_times) / len(self._step_times)),
                    LogType.SCALAR)
            self.console_log('train', meta, step)
            try:
                self.tensorboard_log('train', meta, step)
            except OverflowError:
                pass

    def validate(self, step: int):
        if self.valid_dataset is None:
            log('no valid dataset configured; validation skipped')
            return
        loss = 0.0
        stat = defaultdict(float)

        for i in range(self.valid_max_step):
            batch = next(self.valid_dataset)
            self._ensure_initialized(batch)
            batch_loss, meta = self._get_eval_step()(self.params, batch)
            loss += float(batch_loss)
            meta = _meta_to_host(_unwrap_meta(meta))

            for key, (value, log_type) in meta.items():
                if log_type == LogType.SCALAR:
                    stat[key] += float(np.asarray(value))
            if i % self.log_interval == 0 or i == self.valid_max_step - 1:
                self.console_log('valid', meta, i + 1)

        loss /= self.valid_max_step
        for key in stat:
            if key != 'loss':
                stat[key] = stat[key] / self.valid_max_step
        stat['loss'] = loss

        if loss < self.best_valid_loss:
            self.best_valid_loss = loss

        msg = 'step {} / total stat'.format(step)
        for key, value in sorted(stat.items()):
            msg += '\t{}: {:.6f}'.format(key, value)
        log(msg)

        if self.writer is not None:
            for key, value in stat.items():
                self.writer.add_scalar('valid/{}'.format(key), value, global_step=step)

    # ------------------------------------------------------------------ checkpoints

    @property
    def save_name(self) -> str:
        model_name = type(self.model).__name__ if self.model is not None else 'Model'
        return self.save_prefix + '/' + model_name

    def _checkpoint_dir(self) -> str:
        return os.path.join(self.model_dir, self.save_name)

    def load(self, load_optim: bool = True) -> bool:
        save_path = self._checkpoint_dir()
        check_files = glob.glob(os.path.join(save_path, 'step_*.chkpt'))
        if not check_files:
            log('No any checkpoint in {}. Loading network skipped.'.format(save_path))
            return False

        def step_of(path):
            m = re.search(r'step_(\d+)\.chkpt$', path)
            return int(m.group(1)) if m else -1

        latest_file = max(check_files, key=step_of)
        with open(latest_file, 'rb') as r:
            state = serialization.msgpack_restore(r.read())
        if 'seed' in state:
            # re-seed from the checkpoint so resumed crop/shuffle streams are
            # reproducible (reference `trainer.py:124-134` re-seeds after load)
            self.seed = int(state['seed'])
            np.random.seed(self.seed)
            self.rng = jax.random.PRNGKey(self.seed)
        # exact RNG-state restore (stronger than the reference's re-seed):
        # resumed steps N+1.. replay the same numpy/jax streams the
        # uninterrupted run saw after its step-N save
        if 'np_random' in state:
            st = state['np_random']
            np.random.set_state(('MT19937',
                                 np.asarray(st['keys'], dtype=np.uint32),
                                 int(st['pos']), int(st['has_gauss']),
                                 float(st['cached'])))
        if 'rng' in state:
            self.rng = jnp.asarray(np.asarray(state['rng'], dtype=np.uint32))
        self.params = serialization.from_state_dict(self.params, state['model'])
        if load_optim and 'optim' in state:
            self.opt_state = serialization.from_state_dict(self.opt_state, state['optim'])
        self.step = int(state['step'])
        log("checkpoint '{}' is loaded. previous step={}".format(latest_file, self.step))
        return True

    def save(self, step: int):
        np_st = np.random.get_state()
        state = {
            'step': step,
            'model': serialization.to_state_dict(self.params),
            'optim': serialization.to_state_dict(self.opt_state),
            'pretrained_step': step,
            'seed': self.seed,
            # exact RNG snapshots so a resumed run replays the same streams
            'np_random': {'keys': np.asarray(np_st[1], np.uint32),
                          'pos': int(np_st[2]), 'has_gauss': int(np_st[3]),
                          'cached': float(np_st[4])},
            'rng': np.asarray(self.rng),
        }
        blob = serialization.msgpack_serialize(jax.tree_util.tree_map(np.asarray, state))

        save_path = self._checkpoint_dir()
        os.makedirs(save_path, exist_ok=True)
        with open(os.path.join(save_path, 'step_{:06d}.chkpt'.format(step)), 'wb') as w:
            w.write(blob)

        if self.best_valid_loss != self.cur_best_valid_loss:
            with open(os.path.join(self.model_dir, self.save_name + '.best.chkpt'), 'wb') as w:
                w.write(blob)
            self.cur_best_valid_loss = self.best_valid_loss

        log('step %d / saved model.' % step)

    def load_pretrained_model(self):
        assert os.path.exists(self.pretrained_path), 'You must define pretrained path!'
        with open(self.pretrained_path, 'rb') as r:
            state = serialization.msgpack_restore(r.read())
        self.params = serialization.from_state_dict(self.params, state['model'])

    # ------------------------------------------------------------------ logging

    def console_log(self, tag: str, meta: Dict[str, Any], step: int):
        msg = '{}\t{:06d} it'.format(tag, step)
        for key, (value, log_type) in sorted(meta.items()):
            if log_type == LogType.SCALAR:
                msg += '\t{}: {:.6f}'.format(key, float(np.asarray(value)))
        log(msg)

    def tensorboard_log(self, tag: str, meta: Dict[str, Any], step: int):
        if self.writer is None:
            return
        for key, (value, log_type) in meta.items():
            if log_type != LogType.SCALAR and isinstance(value, jnp.ndarray):
                value = to_numpy(value)
            name = '{}/{}'.format(tag, key)
            try:
                if log_type == LogType.IMAGE:
                    self.writer.add_image(name, imshow_to_buf(value), global_step=step)
                elif log_type == LogType.AUDIO:
                    self.writer.add_audio(name, value, global_step=step,
                                          sample_rate=self.sr)
                elif log_type == LogType.SCALAR:
                    self.writer.add_scalar(name, float(np.asarray(value)),
                                           global_step=step)
                elif log_type == LogType.PLOT:
                    self.writer.add_image(name, plot_to_buf(value), global_step=step)
                elif log_type == LogType.TEXT:
                    self.writer.add_text(name, value, global_step=step)
            except (ImportError, ModuleNotFoundError) as e:
                # e.g. tensorboardX audio encoding needs soundfile; log once
                if name not in self._warned_channels:
                    self._warned_channels.add(name)
                    log('tensorboard channel {} unavailable: {!r}'.format(name, e))

    # ------------------------------------------------------------------ data plumbing

    def repeat_device(self, iterable, prefetch_size: int = 2):
        """Infinite iterator over device-resident (prefetched, sharded) batches."""
        if iterable is None:
            return None
        return iter(prefetch_to_device(self.repeat(iterable),
                                       size=prefetch_size,
                                       sharding=self._batch_sharding))

    @staticmethod
    def repeat(iterable):
        while True:
            yielded = False
            for x in iterable:
                yielded = True
                yield x
            if not yielded:   # empty dataset would otherwise busy-spin forever
                raise ValueError(
                    'dataset yielded no batches — is the split empty?')


def _meta_to_host(meta: Dict[str, Tuple[Any, LogType]]) -> Dict[str, Tuple[Any, LogType]]:
    """Pull meta values to host numpy in one device round-trip."""
    return jax.tree_util.tree_map(
        lambda v: to_numpy(v) if isinstance(v, jnp.ndarray) else v, meta,
        is_leaf=lambda v: isinstance(v, jnp.ndarray))


def _make_writer(log_dir: str):
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(log_dir=log_dir, flush_secs=10)
    except Exception:   # tensorboardX unavailable -> console-only logging
        return None
