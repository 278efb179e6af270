"""The training loop: bucketed batches -> jitted train step -> metrics /
eval / checkpoints.

Replaces the reference's Lightning Trainer wiring (train.py:118-161,
flowmol.py:227-295): manual LR stepping by `epoch_exact`, periodic in-loop
sampling + SampleAnalyzer metrics, val-loss intervals, EMA, checkpointing,
resume.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flowmol_tpu.analysis.metrics import SampleAnalyzer
from flowmol_tpu.analysis.molecule_builder import molecules_from_sampled_state
from flowmol_tpu.data.dataset import MoleculeDataModule
from flowmol_tpu.data.stats import NAtomsDistribution
from flowmol_tpu.model import FlowMol, TrainBatch
from flowmol_tpu.parallel import mesh as pmesh
from flowmol_tpu.train_utils.checkpoint import CheckpointManager, MetricsLogger
from flowmol_tpu.train_utils.optim import LRScheduleConfig
from flowmol_tpu.train_utils.step import (TrainState, create_train_state,
                                          make_eval_step, make_train_step)


def load_weight_ae_marginals(cfg, processed_data_dir):
    """CE class weights for `weight_ae`: the reference builds a/e
    cross-entropy weights (1 - marginal p) from the dataset's marginal
    dists (flowmol.py:208-211, loaded from marginal_dists_file).  Returns
    (p_a, p_e) device arrays, or (None, None) when weight_ae is off."""
    if not cfg.weight_ae or processed_data_dir is None:
        return None, None
    from flowmol_tpu.data.stats import MarginalDists
    md = MarginalDists.load(
        Path(processed_data_dir) / "train_data_marginal_dists.npz")
    p_a, p_e = md.p_a, md.p_e
    if cfg.fake_atom_p > 0:
        # the fake-atom class sits past the real atom types; give it
        # marginal 0 => CE weight 1 (the reference never combines
        # weight_ae with fake atoms, so this is the natural extension)
        p_a = np.concatenate([p_a, np.zeros((1,), p_a.dtype)])
    return jnp.asarray(p_a), jnp.asarray(p_e)


class Trainer:
    def __init__(self, model: FlowMol, data: MoleculeDataModule,
                 run_dir, lr_cfg: LRScheduleConfig,
                 max_epochs: int = 1,
                 ema_decay: float = 0.0,
                 sample_interval: float = 1.0,
                 n_mols_to_sample: int = 64,
                 val_loss_interval: float = 1.0,
                 limit_val_batches: Optional[float] = None,
                 n_atoms_dist: Optional[NAtomsDistribution] = None,
                 atom_type_map=None,
                 processed_data_dir=None,
                 use_mesh: bool = False,
                 max_to_keep: int = 6,
                 monitor: Optional[str] = None,
                 seed: int = 0,
                 logger: Optional[MetricsLogger] = None,
                 max_steps: Optional[int] = None,
                 ckpt_every_steps: int = 500):
        self.model = model
        self.data = data
        self.run_dir = Path(run_dir)
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.sample_interval = sample_interval
        self.n_mols_to_sample = n_mols_to_sample
        self.val_loss_interval = val_loss_interval
        self.limit_val_batches = limit_val_batches
        self.n_atoms_dist = n_atoms_dist
        self.atom_type_map = atom_type_map or model.cfg.atom_type_map
        self.seed = seed
        self.ema_decay = ema_decay

        self.state, self.tx = create_train_state(
            model, jax.random.PRNGKey(seed), lr_cfg, ema_decay)
        p_a, p_e = load_weight_ae_marginals(model.cfg, processed_data_dir)
        train_step = make_train_step(model, self.tx, lr_cfg, ema_decay,
                                     p_a=p_a, p_e=p_e)
        eval_step = make_eval_step(model, p_a=p_a, p_e=p_e)

        self.is_primary = jax.process_index() == 0
        self._local_rows = None  # (host, n_hosts) when multi-process
        if use_mesh and len(jax.devices()) > 1:
            self.mesh = pmesh.make_mesh()
            self.train_step = pmesh.jit_train_step(train_step, self.mesh)
            if jax.process_count() > 1:
                # multi-host: identical batcher schedule on every host, but
                # each host prepares ONLY its contiguous row slice of each
                # global batch (iter_split(local_rows=...)) and contributes
                # it via mesh.shard_local_batch — host prep cost stays
                # constant as hosts are added (adaptive_sampler.py:18-29)
                self._local_rows = (jax.process_index(), jax.process_count())
                self._shard = lambda b: pmesh.shard_local_batch(b, self.mesh)
            else:
                self._shard = lambda b: pmesh.shard_batch_pytree(b, self.mesh)
        else:
            self.mesh = None
            self.train_step = jax.jit(train_step)
            self._shard = lambda b: jax.tree.map(jnp.asarray, b)
        self.eval_step = jax.jit(eval_step)

        self.ckpt = CheckpointManager(self.run_dir, max_to_keep=max_to_keep,
                                      monitor=monitor)
        self._last_val_metrics = {}
        self.logger = logger or MetricsLogger(self.run_dir)
        self.analyzer = SampleAnalyzer(processed_data_dir=processed_data_dir)
        self._sample_fns: Dict[int, object] = {}

        # minimum steps between periodic checkpoints: small datasets make
        # epochs tiny (qm9-synth: ~37 steps), and a per-epoch orbax save is
        # pure overhead — and widens the window in which a SIGSTOPped run
        # (tools/pause_runs.sh benchmark windows) can trip orbax's async
        # barrier timeout.  The final save at max_steps/max_epochs is
        # unconditional, so short dev runs still checkpoint.
        self.ckpt_every_steps = ckpt_every_steps
        self._last_ckpt_step = None

        self.epoch = 0
        self.global_step = 0

    # --------------------------------------------------------------- resume
    def try_resume(self):
        latest = self.ckpt.latest_step()
        if latest is None:
            return False
        extra_tpl = {"epoch": 0, "global_step": 0}
        step, restored = self.ckpt.restore(latest,
                                           template=(self.state, extra_tpl))
        self.state = restored["state"]
        extra = restored.get("extra", {})
        self.epoch = int(extra.get("epoch", 0))
        self.global_step = int(extra.get("global_step", step))
        print(f"resumed from checkpoint step {step} (epoch {self.epoch})")
        return True

    # ----------------------------------------------------------- in-loop eval
    def sample_and_analyze(self, rng_seed: int) -> Dict[str, float]:
        """In-training molecule sampling eval (flowmol.py:241-253)."""
        if self.n_atoms_dist is None:
            return {}
        from flowmol_tpu.api import SAMPLING_BUCKETS
        rng = np.random.default_rng(rng_seed)
        sizes = self.n_atoms_dist.sample(rng, self.n_mols_to_sample)
        n_pad = next((b for b in SAMPLING_BUCKETS if sizes.max() <= b),
                     int(np.ceil(sizes.max() / 32) * 32))
        node_mask = np.arange(n_pad)[None, :] < sizes[:, None]
        params = self.state.ema if self.state.ema is not None else \
            self.state.params
        if n_pad not in self._sample_fns:
            # use the model's own sampling config (flowmol.py:241-253 samples
            # with the model defaults) so in-training metrics are comparable
            # with final evals — not a hardcoded shorter schedule
            self._sample_fns[n_pad] = jax.jit(
                self.model.make_sample_fn(
                    n_timesteps=self.model.cfg.default_n_timesteps))
        final = self._sample_fns[n_pad](params, jax.random.PRNGKey(rng_seed),
                                        jnp.asarray(node_mask))
        final = jax.tree.map(np.asarray, final)
        mols = molecules_from_sampled_state(
            final, node_mask, self.atom_type_map,
            ctmc_mol=self.model.cfg.discrete_cats,
            fake_atoms=self.model.cfg.fake_atom_p > 0,
            explicit_aromaticity=self.model.cfg.explicit_aromaticity)
        return self.analyzer.analyze(mols)

    def validate(self, rng) -> Dict[str, float]:
        agg: Dict[str, list] = {}
        batcher_count = 0
        limit = self.limit_val_batches
        np_rng = np.random.default_rng(self.seed + 999)
        # validate with EMA weights when enabled (the reference's EMA
        # callback swaps them in for validation, utils/ema.py)
        val_params = (self.state.ema if self.state.ema is not None
                      else self.state.params)
        # Lightning semantics (train.py:134-158): limit >= 1 is a batch
        # count, limit < 1 is a fraction of the val split
        max_batches = None
        if limit is not None:
            if limit >= 1:
                max_batches = int(limit)
            else:
                n_val = self.data.batcher("val").n_batches_per_epoch()
                max_batches = max(1, int(limit * n_val))
        for tb in self.data.iter_split("val", np_rng,
                                       local_rows=self._local_rows):
            m = self.eval_step(val_params, self._shard(tb), rng)
            for k, v in m.items():
                agg.setdefault(k, []).append(float(v))
            batcher_count += 1
            if max_batches is not None and batcher_count >= max_batches:
                break
        return {k: float(np.mean(v)) for k, v in agg.items()}

    def _dispatch_step(self, tb, k_step, epoch_exact):
        """Dispatch one train step, retrying transient runtime failures.

        Long runs on remote-attached accelerators see occasional transport
        errors from the compile/execute service (e.g. "response body closed
        before all bytes were read"); a failed dispatch never updated
        `self.state`, so retrying the same step is exact.  Deterministic
        errors (shape/type/OOM) still fail fast: we retry only
        JaxRuntimeError whose message marks a transport/service fault, with
        exponential backoff (the reference's Lightning loop has no such
        guard — its trainings die on any runtime hiccup)."""
        transient = ("INTERNAL", "UNAVAILABLE", "DEADLINE_EXCEEDED",
                     "read body", "connection", "Connection")
        delay = 5.0
        for attempt in range(6):
            try:
                return self.train_step(self.state, self._shard(tb), k_step,
                                       jnp.asarray(epoch_exact))
            except jax.errors.JaxRuntimeError as e:
                msg = str(e)
                if attempt == 5 or not any(s in msg for s in transient):
                    raise
                print(f"transient runtime error at step {self.global_step} "
                      f"(attempt {attempt + 1}/6, retrying in {delay:.0f}s): "
                      f"{msg.splitlines()[0][:200]}")
                time.sleep(delay)
                delay = min(delay * 2, 120.0)

    # ------------------------------------------------------------------ fit
    def fit(self):
        if self.epoch >= self.max_epochs:
            print(f"nothing to do: resumed at epoch {self.epoch} >= "
                  f"max_epochs {self.max_epochs} (pass --max_epochs to extend)")
            return
        np_rng = np.random.default_rng(self.seed)
        rng = jax.random.PRNGKey(self.seed + 1)
        batches_per_epoch = max(self.data.batcher("train").n_batches_per_epoch(),
                                1)
        # on resume, anchor the eval markers at the resumed epoch: a
        # segment restart must not re-run the in-loop sampling/val evals
        # immediately (segmented supervision restarts every few thousand
        # steps; an eval per restart would be pure overhead)
        last_sample_marker = float(self.epoch)
        last_val_marker = float(self.epoch)
        t_start = time.time()
        mols_seen = 0

        for epoch in range(self.epoch, self.max_epochs):
            self.epoch = epoch
            for batch_idx, tb in enumerate(self.data.iter_split(
                    "train", np_rng, local_rows=self._local_rows)):
                epoch_exact = epoch + batch_idx / batches_per_epoch
                rng, k_step = jax.random.split(rng)
                self.state, metrics = self._dispatch_step(
                    tb, k_step, epoch_exact)
                self.global_step += 1
                # global molecule count (tb holds only local rows multi-host)
                mols_seen += tb.node_mask.shape[0] * (
                    self._local_rows[1] if self._local_rows else 1)

                if self.global_step % 50 == 0 or self.global_step == 1:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    metrics["epoch_exact"] = epoch_exact
                    dt = time.time() - t_start
                    metrics["samples_per_sec"] = mols_seen / max(dt, 1e-9)
                    self.logger.log(metrics, step=self.global_step)

                if (self.sample_interval and
                        epoch_exact - last_sample_marker >= self.sample_interval):
                    last_sample_marker = epoch_exact
                    try:
                        sm = self.sample_and_analyze(self.global_step)
                        if sm:
                            self.logger.log(sm, step=self.global_step)
                    except Exception as e:  # keep training alive
                        print(f"in-loop sampling eval failed: {e}")

                if (self.val_loss_interval and
                        epoch_exact - last_val_marker >= self.val_loss_interval):
                    last_val_marker = epoch_exact
                    rng, k_val = jax.random.split(rng)
                    vm = self.validate(k_val)
                    if vm:
                        vm["epoch_exact"] = epoch_exact
                        self.logger.log(vm, step=self.global_step)
                        self._last_val_metrics = vm

                if self.max_steps and self.global_step >= self.max_steps:
                    break

            # orbax save is collective over processes for multi-host
            # arrays (the manager coordinates; the primary writes).
            # Periodic saves respect ckpt_every_steps; the end-of-training
            # save below is unconditional.
            done = ((self.max_steps and self.global_step >= self.max_steps)
                    or epoch + 1 >= self.max_epochs)
            if done or (self._last_ckpt_step is None
                        or self.global_step - self._last_ckpt_step
                        >= self.ckpt_every_steps):
                self.ckpt.save(self.global_step, self.state,
                               extra={"epoch": epoch + 1,
                                      "global_step": self.global_step},
                               metrics=self._last_val_metrics)
                self._last_ckpt_step = self.global_step
            if done:
                break
        return self.state
