"""FlowMol-TPU: the flow-matching model tying scheduler, network, paths,
losses and the sampler together.

Behavioural parity target: `FlowMol` in /root/reference/flowmol/models/flowmol.py
(forward/losses 297-415, sample_prior 417-448, sample 489-589) plus the
`integrate`/`step` logic of EndpointVectorField (vector_field.py:388-564) and
CTMCVectorField (ctmc_vector_field.py:145-411).

TPU design deltas (SURVEY.md §7):
  * the whole train objective is one pure function (jit/pjit-able);
  * the sampler is a single `lax.scan` over timesteps — zero host round-trips;
  * all four parameterizations share one padded dense state layout.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flowmol_tpu.fm import ctmc
from flowmol_tpu.fm.interpolant import FEAT_INDEX, InterpolantSchedule
from flowmol_tpu.graphs import (CANONICAL_FEAT_ORDER, is_graph_ids,
                                masked_mean_nodes, node_validity, remove_com)
from flowmol_tpu.nn.vector_field import MolGVPNet, VectorFieldConfig

PARAMETERIZATIONS = ("endpoint", "vector-field", "dirichlet", "ctmc")


# --------------------------------------------------------------------------- #
# configs
# --------------------------------------------------------------------------- #

@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Inference-time knobs (CTMC unless noted).

    Parity: ctmc_vector_field.py:23-60 constructor defaults and the
    integrate() overrides (145-154); continuous_inv_temp for endpoint models
    (vector_field.py:199-209).
    """

    stochasticity: float = 8.0
    high_confidence_threshold: float = 0.9
    dfm_type: str = "campbell"
    cat_temperature_schedule: Any = 0.05   # 'decay' | float
    cat_temp_decay_max: float = 0.8
    cat_temp_decay_a: float = 2.0
    forward_weight_schedule: Any = "beta"  # 'beta' | float
    fw_beta_a: float = 0.25
    fw_beta_b: float = 0.25
    fw_beta_max: float = 10.0
    continuous_inv_temp_schedule: Optional[str] = None  # None | 'linear'
    continuous_inv_temp_max: float = 10.0

    def cat_temp(self, t):
        return ctmc.cat_temperature(t, self.cat_temperature_schedule,
                                    self.cat_temp_decay_max, self.cat_temp_decay_a)

    def fw(self, t):
        return ctmc.forward_weight(t, self.forward_weight_schedule,
                                   self.fw_beta_a, self.fw_beta_b, self.fw_beta_max)

    def inv_temp(self, t):
        if self.continuous_inv_temp_schedule is None:
            return jnp.asarray(1.0)
        if self.continuous_inv_temp_schedule == "linear":
            return self.continuous_inv_temp_max * (1.0 - t)
        raise ValueError(
            f"invalid continuous_inv_temp_schedule {self.continuous_inv_temp_schedule}")


@dataclasses.dataclass(frozen=True)
class FlowMolConfig:
    atom_type_map: Tuple[str, ...]
    n_atom_charges: int = 6
    parameterization: str = "ctmc"
    explicit_aromaticity: bool = False
    time_scaled_loss: bool = True
    weight_ae: bool = False
    target_blur: float = 0.0
    total_loss_weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    fake_atom_p: float = 0.0
    fake_atom_std: float = 1.0
    distort_p: float = 0.0
    distort_t: float = 0.5
    default_n_timesteps: int = 250
    scprop: float = 0.5
    prior_x_std: float = 1.0
    dirichlet_w_max: float = 32.0
    schedule: InterpolantSchedule = InterpolantSchedule()
    vf: VectorFieldConfig = None  # type: ignore[assignment]
    sampling: SamplingConfig = SamplingConfig()
    # full prior_config dict (per-modality type/align/kwargs), used for
    # inference-time prior sampling of non-CTMC parameterizations
    prior_config: Any = None

    @property
    def n_atom_types(self) -> int:
        # fake atoms add one atom-type class (flowmol.py:76-81)
        return len(self.atom_type_map) + (1 if self.fake_atom_p > 0 else 0)

    @property
    def n_bond_types(self) -> int:
        return 5 if self.explicit_aromaticity else 4

    @property
    def is_ctmc(self) -> bool:
        return self.parameterization == "ctmc"

    @property
    def n_cats(self) -> Dict[str, int]:
        return {"a": self.n_atom_types, "c": self.n_atom_charges,
                "e": self.n_bond_types}

    @property
    def mask_idxs(self) -> Dict[str, int]:
        return self.n_cats

    @property
    def cat_prior_masked(self) -> bool:
        """Endpoint parameterization with the ctmc mask prior.  This is the
        only categorical prior the current reference permits for ANY
        parameterization (flowmol.py:190-193), though its EndpointVectorField
        cannot actually run it (sample_conditional_path would shape-mismatch
        the (K+1)-dim prior against the K-dim target, vector_field.py:576-590).

        Here the combination is implemented to completion as the masked
        discrete flow it mathematically is: Bernoulli-sampled mask/real token
        states on the (K+1)-simplex in training, CE on still-masked tokens,
        and jump-process (CTMC) sampling — i.e. the proven CTMC machinery
        with one-hot simplex network inputs instead of token embeddings.
        A deterministic *linear* path from the mask vertex is NOT used: at
        any alpha>0 the true class is the only real class with mass, so the
        network just copies its input (CE -> 0) and has no signal at
        sampling time (measured: 0.0 valid after 5k steps)."""
        if self.is_ctmc or not self.prior_config:
            return False
        return (self.prior_config.get("a", {}) or {}).get("type") == "ctmc"

    @property
    def discrete_cats(self) -> bool:
        """True when categorical features are token states sampled by the
        discrete jump process (ctmc parameterization, or endpoint with the
        ctmc mask prior)."""
        return self.is_ctmc or self.cat_prior_masked

    @classmethod
    def from_config(cls, cfg: dict) -> "FlowMolConfig":
        """Build from the reference's YAML schema (mol_fm / vector_field /
        interpolant_scheduler sections; see configs/dev.yml in the reference)."""
        mol_fm = dict(cfg.get("mol_fm", {}))
        vf_cfg = dict(cfg.get("vector_field", {}))
        ds_cfg = cfg.get("dataset", {})
        parameterization = mol_fm.get("parameterization", "endpoint")
        if parameterization not in PARAMETERIZATIONS:
            raise ValueError(f"parameterization must be one of {PARAMETERIZATIONS}")
        atom_map = tuple(ds_cfg.get("atom_map", mol_fm.get("atom_type_map", ())))
        explicit_aromaticity = bool(mol_fm.get("explicit_aromaticity", False))
        fake_atom_p = float(mol_fm.get("fake_atom_p", 0.0) or 0.0)
        n_charges = int(mol_fm.get("n_atom_charges", 6))
        n_bond = 5 if explicit_aromaticity else 4

        tlw = mol_fm.get("total_loss_weights", {}) or {}
        weights = tuple(float(tlw.get(f, 1.0)) for f in CANONICAL_FEAT_ORDER)

        schedule = InterpolantSchedule.from_config(cfg.get("interpolant_scheduler"))

        prior_cfg = mol_fm.get("prior_config", {}) or {}
        prior_x_std = float(((prior_cfg.get("x") or {}).get("kwargs") or {})
                            .get("std", 1.0))

        cat_prior = (prior_cfg.get("a", {}) or {}).get("type")
        if cat_prior == "ctmc" and parameterization in ("vector-field",
                                                        "dirichlet"):
            # the mask prior needs a network head for the mask class under
            # vector-field (its MSE target is (K+1)-dim) and breaks the
            # dirichlet betainc tables; the reference supports neither either
            raise NotImplementedError(
                f"ctmc mask prior is not supported for the "
                f"{parameterization} parameterization (use endpoint or ctmc)")

        n_atom_types = len(atom_map) + (1 if fake_atom_p > 0 else 0)
        vf = VectorFieldConfig.from_config(
            vf_cfg, n_atom_types=n_atom_types, n_charges=n_charges,
            n_bond_types=n_bond,
            has_mask=(parameterization == "ctmc" or cat_prior == "ctmc"))

        samp_keys = {f.name for f in dataclasses.fields(SamplingConfig)}
        samp_kw = {k: v for k, v in vf_cfg.items()
                   if k in samp_keys and v is not None}

        return cls(
            atom_type_map=atom_map,
            n_atom_charges=n_charges,
            parameterization=parameterization,
            explicit_aromaticity=explicit_aromaticity,
            time_scaled_loss=bool(mol_fm.get("time_scaled_loss", True)),
            weight_ae=bool(mol_fm.get("weight_ae", False)),
            target_blur=float(mol_fm.get("target_blur", 0.0) or 0.0),
            total_loss_weights=weights,
            fake_atom_p=fake_atom_p,
            fake_atom_std=float(mol_fm.get("fake_atom_std", 1.0) or 1.0),
            distort_p=float(mol_fm.get("distort_p", 0.0) or 0.0),
            distort_t=float(mol_fm.get("distort_t", 0.5) or 0.5),
            default_n_timesteps=int(mol_fm.get("default_n_timesteps", 250)),
            scprop=float(vf_cfg.get("scprop", 0.5) or 0.5),
            prior_x_std=prior_x_std,
            dirichlet_w_max=float(vf_cfg.get("w_max", 32.0) or 32.0),
            schedule=schedule,
            vf=vf,
            sampling=SamplingConfig(**samp_kw),
            prior_config=prior_cfg,
        )


# --------------------------------------------------------------------------- #
# train batch pytree
# --------------------------------------------------------------------------- #

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainBatch:
    """One padded training batch.

    Ground truth (t=1): x1 (B,N,3) f32; a1/c1 (B,N) int tokens;
    e1 (B,N,N) int symmetric tokens (any int dtype — int8 slabs minimize the
    host->device transfer; normalized to i32 on device in `loss_fn`).
    Prior (t=0): x0 (B,N,3), OT-coupled on host like dataset.py:168-183.
    a0/c0 (B,N,K[+1]) f32 and e0 (B,N,N,K[+1]) f32 may be None: categorical
    priors are iid (never OT-aligned in practice), so `loss_fn` samples them
    ON DEVICE from its rng — skipping the host-side generation and the
    dominant (B,N,N,K) f32 transfer over the device link.  CTMC and
    dirichlet parameterizations never read them at all.
    node_mask (B,N) bool.
    """

    x1: jnp.ndarray
    a1: jnp.ndarray
    c1: jnp.ndarray
    e1: jnp.ndarray
    x0: jnp.ndarray
    a0: jnp.ndarray
    c0: jnp.ndarray
    e0: jnp.ndarray
    node_mask: jnp.ndarray

    def tree_flatten(self):
        return ((self.x1, self.a1, self.c1, self.e1, self.x0, self.a0,
                 self.c0, self.e0, self.node_mask), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


# --------------------------------------------------------------------------- #
# the model
# --------------------------------------------------------------------------- #

class FlowMol:
    """Stateless model: holds configs + the flax network definition.

    All compute methods are pure functions of (params, data, rng) suitable for
    jit / pjit / scan.
    """

    def __init__(self, cfg: FlowMolConfig):
        if cfg.vf is None:
            raise ValueError("FlowMolConfig.vf must be set")
        self.cfg = cfg
        self.net = MolGVPNet(cfg.vf)
        self._dirichlet_flows = None

    @property
    def dirichlet_flows(self):
        """Per-modality DirichletConditionalFlow tables (built lazily;
        parity: vector_field.py:650-656)."""
        if self._dirichlet_flows is None:
            from flowmol_tpu.fm.dirichlet import DirichletConditionalFlow
            w_max = self.cfg.dirichlet_w_max
            by_k = {}  # modalities with equal K share one table (and its
            #            single embedded HLO constant in the compiled sampler)
            for f in ("a", "c", "e"):
                k = self.cfg.n_cats[f]
                if k not in by_k:
                    by_k[k] = DirichletConditionalFlow.build(
                        k, alpha_min=0.0, alpha_max=w_max + 2)
            self._dirichlet_flows = {f: by_k[self.cfg.n_cats[f]]
                                     for f in ("a", "c", "e")}
        return self._dirichlet_flows

    # ------------------------------------------------------------------ init
    def init_params(self, rng, batch_size: int = 2, n_nodes: int = 8):
        cfg = self.cfg
        km = cfg.vf.n_mask_feats or int(cfg.cat_prior_masked)
        x = jnp.zeros((batch_size, n_nodes, 3))
        a = jnp.zeros((batch_size, n_nodes, cfg.n_atom_types + km))
        c = jnp.zeros((batch_size, n_nodes, cfg.n_atom_charges + km))
        e = jnp.zeros((batch_size, n_nodes, n_nodes, cfg.n_bond_types + km))
        t = jnp.zeros((batch_size,))
        nm = jnp.ones((batch_size, n_nodes), bool)
        # one jitted init program: eager init dispatches hundreds of tiny
        # ops which is pathologically slow over a remote-TPU tunnel
        return jax.jit(self.net.init)({"params": rng}, x, a, c, e, t, nm)

    # --------------------------------------------------------- conditional path
    def sample_conditional_path(self, rng, batch: TrainBatch, t: jnp.ndarray):
        """p(g_t | g_0, g_1) per parameterization. Returns dict of x_t arrays:
        x (B,N,3); a/c (B,N,Ka[+1]); e (B,N,N,Ke[+1]) — all float one-hot or
        simplex representations ready for the network."""
        cfg = self.cfg
        alpha = cfg.schedule.alpha_t(t)  # (B, 4)
        n = batch.node_mask.shape[1]
        out = {}

        ax = alpha[:, FEAT_INDEX["x"]][:, None, None]
        out["x"] = (1 - ax) * batch.x0 + ax * batch.x1

        if cfg.discrete_cats:
            # ctmc — and the masked endpoint, whose conditional path is the
            # same Bernoulli mask/real token draw (see cat_prior_masked)
            ka, kc, ke = cfg.n_atom_types, cfg.n_atom_charges, cfg.n_bond_types
            ra, rc, re = jax.random.split(rng, 3)
            a_t = ctmc.mask_tokens(ra, batch.a1, alpha[:, 1], ka)
            c_t = ctmc.mask_tokens(rc, batch.c1, alpha[:, 2], kc)
            out["a"] = jax.nn.one_hot(a_t, ka + 1)
            out["c"] = jax.nn.one_hot(c_t, kc + 1)
            e1_up = ctmc.edges_to_upper(batch.e1, n)
            e_up = ctmc.mask_tokens(re, e1_up, alpha[:, 3], ke)
            out["e"] = ctmc.upper_to_dense(jax.nn.one_hot(e_up, ke + 1), n)
        elif cfg.parameterization == "dirichlet":
            # Dirichlet(1 + w_t * one_hot(x1)) per category
            # (vector_field.py:668-698)
            w = alpha * cfg.dirichlet_w_max + 1.0
            keys = jax.random.split(rng, 3)
            for key, feat, x1_tok, kk, aidx in (
                    (keys[0], "a", batch.a1, cfg.n_atom_types, 1),
                    (keys[1], "c", batch.c1, cfg.n_atom_charges, 2)):
                onehot = jax.nn.one_hot(x1_tok, kk)
                params = 1.0 + w[:, aidx][:, None, None] * onehot
                g = jax.random.gamma(key, params)
                out[feat] = g / jnp.sum(g, -1, keepdims=True)
            e1_up = ctmc.edges_to_upper(batch.e1, n)
            onehot = jax.nn.one_hot(e1_up, cfg.n_bond_types)
            params = 1.0 + w[:, 3][:, None, None] * onehot
            g = jax.random.gamma(keys[2], params)
            out["e"] = ctmc.upper_to_dense(g / jnp.sum(g, -1, keepdims=True), n)
        else:  # endpoint / vector-field: linear interpolation on the simplex
            for feat, x1_tok, x0f, kk, idx in (
                    ("a", batch.a1, batch.a0, cfg.n_atom_types, 1),
                    ("c", batch.c1, batch.c0, cfg.n_atom_charges, 2)):
                af = alpha[:, idx][:, None, None]
                out[feat] = (1 - af) * x0f + af * jax.nn.one_hot(x1_tok, kk)
            af = alpha[:, 3][:, None, None, None]
            out["e"] = (1 - af) * batch.e0 + af * jax.nn.one_hot(
                batch.e1, cfg.n_bond_types)
        return out

    # ------------------------------------------------------------------ loss
    def loss_fn(self, params, batch: TrainBatch, rng, train: bool = True,
                p_a: Optional[jnp.ndarray] = None,
                p_e: Optional[jnp.ndarray] = None):
        """Per-feature flow-matching losses (flowmol.py:297-415)."""
        cfg = self.cfg
        B = batch.x1.shape[0]
        n = batch.node_mask.shape[1]
        k_t, k_path, k_distort, k_sc, k_drop = jax.random.split(rng, 5)

        # int8 slab tokens (minimal transfer) -> i32 for one_hot/indexing
        if batch.a1.dtype != jnp.int32:
            batch = dataclasses.replace(
                batch, a1=batch.a1.astype(jnp.int32),
                c1=batch.c1.astype(jnp.int32), e1=batch.e1.astype(jnp.int32))
        # device-side categorical priors (see TrainBatch docstring); only the
        # continuous simplex parameterizations consume a0/c0/e0
        if (batch.a0 is None and not cfg.discrete_cats
                and cfg.parameterization != "dirichlet"):
            pr = self._sample_categorical_priors(
                jax.random.fold_in(k_path, 13), (B, n))  # e already dense
            batch = dataclasses.replace(
                batch, a0=pr["a"], c0=pr["c"], e0=pr["e"])

        t = jax.random.uniform(k_t, (B,))
        state = self.sample_conditional_path(k_path, batch, t)

        # distortion augmentation (flowmol.py:333-337)
        if cfg.distort_p > 0:
            t_gate = (t > cfg.distort_t)[:, None, None]
            dm = (jax.random.uniform(k_distort, (B, n, 1)) < cfg.distort_p) & t_gate
            noise = jax.random.normal(jax.random.fold_in(k_distort, 1),
                                      batch.x1.shape)
            state["x"] = state["x"] + noise * dm * 0.5

        state["x"] = state["x"] * batch.node_mask[..., None]

        # self-conditioning: one coin per batch (flowmol.py semantics via
        # vector_field.py:271, P(apply) = 1 - scprop); lax.cond skips the
        # bootstrap forward entirely on tails instead of always paying 2x
        prev_dst = None
        sc_mask = None
        if cfg.vf.self_conditioning:
            coin = jax.random.bernoulli(k_sc, 1.0 - cfg.scprop) if train else \
                jnp.asarray(False)

            def boot(_):
                return jax.lax.stop_gradient(self.net.apply(
                    params, state["x"], state["a"], state["c"], state["e"],
                    t, batch.node_mask, method=MolGVPNet.bootstrap))

            zeros = jax.tree.map(
                lambda s_: jnp.zeros(s_.shape, s_.dtype),
                jax.eval_shape(boot, None))
            prev_dst = jax.lax.cond(coin, boot, lambda _: zeros, None)
            sc_mask = jnp.broadcast_to(coin, (B,))

        rngs = {"dropout": k_drop} if (train and cfg.vf.dropout > 0) else {}
        dst = self.net.apply(
            params, state["x"], state["a"], state["c"], state["e"], t,
            batch.node_mask, prev_dst=prev_dst, sc_apply_mask=sc_mask,
            apply_softmax=False, remove_com=False,
            deterministic=not train, rngs=rngs)

        k_blur = jax.random.fold_in(k_path, 7)
        return self._compute_losses(dst, state, batch, t, p_a=p_a, p_e=p_e,
                                    blur_rng=k_blur)

    def _compute_losses(self, dst, state, batch: TrainBatch, t, p_a=None,
                        p_e=None, blur_rng=None):
        cfg = self.cfg
        n = batch.node_mask.shape[1]
        nm = batch.node_mask
        nmf = nm.astype(jnp.float32)
        up_valid = ctmc.upper_valid_mask(nm).astype(jnp.float32)

        tw = (cfg.schedule.loss_weights(t) if cfg.time_scaled_loss
              else jnp.ones((t.shape[0], 4)))
        alpha_prime = cfg.schedule.alpha_t_prime(t)

        losses = {}

        # ---- x (MSE) ----
        if cfg.parameterization == "vector-field":
            # the vector-field parameterization predicts the velocity: the
            # network's position output minus x_t (VectorField.forward,
            # vector_field.py:600-605) — in training AND sampling
            x_target = alpha_prime[:, 0][:, None, None] * (batch.x1 - batch.x0)
            x_pred = dst["x"] - state["x"]
        else:
            x_target = batch.x1
            x_pred = dst["x"]
        se = jnp.square(x_pred - x_target) * nmf[..., None]
        w = tw[:, 0][:, None, None]
        losses["x"] = jnp.sum(se * w) / jnp.maximum(jnp.sum(nmf) * 3.0, 1.0)

        # ---- categorical feats ----
        for feat, idx in (("a", 1), ("c", 2), ("e", 3)):
            k = cfg.n_cats[feat]
            if feat == "e":
                logits = ctmc.edges_to_upper(dst["e"], n)
                tokens = ctmc.edges_to_upper(batch.e1, n)
                xt = ctmc.edges_to_upper(state["e"], n)
                valid = up_valid
                w = tw[:, idx][:, None]
            else:
                logits = dst[feat]
                tokens = batch.a1 if feat == "a" else batch.c1
                xt = state[feat]
                valid = nmf
                w = tw[:, idx][:, None]

            if cfg.parameterization == "vector-field":
                # MSE against alpha' * (x1_onehot - x0)  (flowmol.py:363-375)
                x0f = (ctmc.edges_to_upper(batch.e0, n) if feat == "e"
                       else (batch.a0 if feat == "a" else batch.c0))
                ap = alpha_prime[:, idx][:, None, None]
                target = ap * (jax.nn.one_hot(tokens, k) - x0f)
                se = jnp.square(logits - target) * valid[..., None]
                losses[feat] = jnp.sum(se * w[..., None]) / jnp.maximum(
                    jnp.sum(valid) * k, 1.0)
                continue

            logp = jax.nn.log_softmax(logits, axis=-1)
            if cfg.target_blur > 0:
                # soft targets: blur + renormalize (flowmol.py:357-361)
                soft = jax.nn.one_hot(tokens, k)
                kb = jax.random.fold_in(blur_rng, FEAT_INDEX[feat])
                soft = soft + jax.random.normal(kb, soft.shape) * cfg.target_blur
                soft = jax.nn.softmax(soft, axis=-1)
                if cfg.weight_ae and feat in ("a", "e"):
                    # torch CrossEntropyLoss(weight) on class-probability
                    # targets: weights enter the numerator per class and
                    # 'mean' still divides by N (no weighted denominator)
                    pw = p_a if feat == "a" else p_e
                    if pw is not None:
                        soft = soft * (1.0 - pw)
                ce = -jnp.sum(soft * logp, axis=-1)
            else:
                ce = -jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
                if cfg.weight_ae and feat in ("a", "e"):
                    pw = p_a if feat == "a" else p_e
                    if pw is not None:
                        cw = 1.0 - pw
                        ce = ce * cw[tokens]

            denom = jnp.sum(valid)
            if cfg.discrete_cats:
                # loss only where x_t is still the mask token
                # (flowmol.py:378-384).  With time_scaled_loss the reference
                # uses reduction='none' + .mean(), so ignored entries stay in
                # the denominator; without it, CrossEntropyLoss('mean')
                # divides by the non-ignored count only.
                is_masked = (jnp.argmax(xt, -1) == cfg.mask_idxs[feat])
                ce = ce * is_masked
                if not cfg.time_scaled_loss:
                    denom = jnp.sum(valid * is_masked)
            if (not cfg.time_scaled_loss and cfg.weight_ae
                    and cfg.target_blur == 0 and feat in ("a", "e")):
                pw = p_a if feat == "a" else p_e
                if pw is not None:
                    # weighted 'mean' divides by the sum of target weights
                    denom = jnp.sum((1.0 - pw)[tokens] * valid *
                                    (is_masked if cfg.discrete_cats else 1.0))

            ce = ce * valid * w
            losses[feat] = jnp.sum(ce) / jnp.maximum(denom, 1.0)

        total = sum(wt * losses[f]
                    for wt, f in zip(cfg.total_loss_weights, CANONICAL_FEAT_ORDER))
        losses["total"] = total
        return total, losses

    # ------------------------------------------------------------------ prior
    def sample_prior(self, rng, node_mask: jnp.ndarray):
        """Inference-time prior (flowmol.py:417-448): centered-normal x;
        masked categorical tokens under CTMC, simplex priors otherwise."""
        cfg = self.cfg
        B, n = node_mask.shape
        kx, kcat = jax.random.split(rng)
        x0 = jax.random.normal(kx, (B, n, 3)) * cfg.prior_x_std
        x0 = remove_com(x0, node_mask)
        if cfg.discrete_cats:
            a0 = jnp.full((B, n), cfg.n_atom_types, jnp.int32)
            c0 = jnp.full((B, n), cfg.n_atom_charges, jnp.int32)
            m = n * (n - 1) // 2
            e0 = jnp.full((B, m), cfg.n_bond_types, jnp.int32)
            return {"x": x0, "a": a0, "c": c0, "e_up": e0}
        return {"x": x0, **self._sample_categorical_priors(kcat, (B, n))}

    def _sample_categorical_priors(self, rng, bn: Tuple[int, int]):
        """Simplex-valued categorical priors for continuous parameterizations
        (the reference's inference_prior_register, priors.py:255-264).

        Note the current reference *gates these off* (flowmol.py:190-193
        raises for any non-ctmc categorical prior); we keep them working for
        FlowMol1-style endpoint/dirichlet sampling."""
        from flowmol_tpu.data import priors as jp
        cfg = self.cfg
        B, n = bn
        pc = cfg.prior_config or {}
        out = {}
        keys = jax.random.split(rng, 3)
        for key, feat in zip(keys, ("a", "c", "e")):
            fc = pc.get(feat, {"type": "uniform-simplex", "kwargs": {}})
            ptype = fc.get("type", "uniform-simplex")
            kw = fc.get("kwargs", {}) or {}
            k = cfg.n_cats[feat]
            shape = (B, n * (n - 1) // 2, k) if feat == "e" else (B, n, k)
            if ptype == "ctmc":
                # mask-vertex prior on the (K+1)-simplex (masked endpoint)
                s = jp.ctmc_masked(shape[:-1], k)
            elif ptype == "gaussian":
                s = jp.gaussian_simplex(key, shape, **kw)
            elif ptype == "barycenter":
                s = jp.barycenter(key, shape, **kw)
            elif ptype == "uniform-simplex":
                s = jp.uniform_simplex(key, shape)
            elif ptype == "biased-simplex":
                s = jp.biased_simplex(key, shape, **kw)
            elif ptype == "marginal":
                s = jp.marginal(key, shape, p=jnp.asarray(kw["p"]))
            elif ptype == "c-given-a":
                s = jp.c_given_a(key, shape, out["a"],
                                 p_c_given_a=jnp.asarray(kw["p_c_given_a"]))
            else:
                raise NotImplementedError(
                    f"inference prior '{ptype}' for feature {feat}")
            if feat == "e":
                s = ctmc.upper_to_dense(s, n)
            out[feat] = s
        return out

    # --------------------------------------------------------------- integrate
    def integrate(self, params, rng, prior_state, node_mask,
                  n_timesteps: int, stochasticity: Optional[float] = None,
                  high_confidence_threshold: Optional[float] = None,
                  dfm_type: Optional[str] = None,
                  visualize: bool = False,
                  n_graphs_per_row: Optional[int] = None,
                  simplex_project: bool = False):
        """Integrate the sampling trajectory with one lax.scan.

        prior_state: dict from `sample_prior` (CTMC token states).
        Returns final state dict (tokens for a/c/e_up, positions x) and, when
        `visualize`, stacked per-step trajectory frames.

        `node_mask` may be a bool validity mask or an int graph-id mask for
        packed rows (several molecules per padded row; graphs.is_graph_ids);
        when packed, `n_graphs_per_row` must give the static max molecules
        per row (purity sampling's per-molecule budget math needs it).
        """
        cfg = self.cfg
        if cfg.parameterization == "dirichlet":
            return self._integrate_dirichlet(params, rng, prior_state,
                                             node_mask, n_timesteps, visualize)
        if not cfg.discrete_cats:
            return self._integrate_continuous(params, rng, prior_state,
                                              node_mask, n_timesteps, visualize,
                                              simplex_project=simplex_project)
        # discrete jump-process sampling: ctmc, and the masked endpoint
        # (endpoint network + ctmc mask prior) which shares the whole path

        samp = cfg.sampling
        eta = samp.stochasticity if stochasticity is None else stochasticity
        hc = (samp.high_confidence_threshold if high_confidence_threshold is None
              else high_confidence_threshold)
        dfm = dfm_type or samp.dfm_type
        if dfm not in ("campbell", "gat"):
            raise ValueError(f"invalid dfm_type {dfm}")

        B, n = node_mask.shape
        ka, kc, ke = cfg.n_atom_types, cfg.n_atom_charges, cfg.n_bond_types
        t_grid = jnp.linspace(0.0, 1.0, n_timesteps)
        alpha = cfg.schedule.alpha_t(t_grid)
        alpha_prime = cfg.schedule.alpha_t_prime(t_grid)

        nm_valid = node_validity(node_mask)
        up_valid = ctmc.upper_valid_mask(node_mask)
        packed = is_graph_ids(node_mask)
        if packed and n_graphs_per_row is None:
            raise ValueError("packed (graph-id) node_mask requires "
                             "n_graphs_per_row")
        seg_node = node_mask if packed else None
        seg_edge = ctmc.upper_segment_ids(node_mask) if packed else None

        # when the network embeds tokens (CTMC configs), feed integer tokens
        # straight through — building (B,N,N,K+1) one-hots per scan step just
        # for the embedding layer to argmax them back wastes HBM bandwidth.
        # (The diagonal decodes as class 0, exactly like the all-zero one-hot
        # rows argmax'd to 0 before.)
        use_tokens = (cfg.vf.a_token_dim > 0 and cfg.vf.c_token_dim > 0
                      and cfg.vf.e_token_dim > 0)

        def onehot_state(st):
            if use_tokens:
                return (st["x"], st["a"], st["c"],
                        ctmc.upper_to_dense(st["e_up"], n))
            return (st["x"],
                    jax.nn.one_hot(st["a"], ka + 1),
                    jax.nn.one_hot(st["c"], kc + 1),
                    ctmc.upper_to_dense(jax.nn.one_hot(st["e_up"], ke + 1), n))

        def forward(st, t_scalar, prev_dst):
            x, a, c, e = onehot_state(st)
            t_vec = jnp.full((B,), t_scalar)
            return self.net.apply(params, x, a, c, e, t_vec, node_mask,
                                  prev_dst=prev_dst, apply_softmax=True,
                                  remove_com=True, deterministic=True)

        # first-step self-conditioning bootstrap (vector_field.py:269-283):
        # at t=0 the previous endpoint estimate comes from a plain pass.
        prev0 = None
        if cfg.vf.self_conditioning:
            x, a, c, e = onehot_state(prior_state)
            prev0 = self.net.apply(params, x, a, c, e, jnp.zeros((B,)),
                                   node_mask, method=MolGVPNet.bootstrap)

        def step(carry, xs):
            st, prev_dst, key = carry
            t_i, alpha_i, ap_i, last, dt = xs
            key, k_step = jax.random.split(key)
            dst = forward(st, t_i, prev_dst)

            # positions: Euler step on the endpoint field
            vf = ap_i[0] / jnp.maximum(1.0 - alpha_i[0], 1e-9) * (dst["x"] - st["x"])
            x_new = (st["x"] + dt * vf) * nm_valid[..., None]

            new_st = {"x": x_new}
            keys = jax.random.split(k_step, 3)
            for kk, feat, tok_key, kcat, midx, valid, seg in (
                    (keys[0], "a", "a", ka, ka, nm_valid, seg_node),
                    (keys[1], "c", "c", kc, kc, nm_valid, seg_node),
                    (keys[2], "e", "e_up", ke, ke, up_valid, seg_edge)):
                fidx = FEAT_INDEX[feat]
                p1 = dst[feat]
                if feat == "e":
                    p1 = ctmc.edges_to_upper(p1, n)
                p1 = ctmc.sharpen(p1, samp.cat_temp(t_i))
                if dfm == "campbell":
                    res = ctmc.campbell_step(
                        kk, p1, st[tok_key], stochasticity=eta, hc_thresh=hc,
                        alpha_t=alpha_i[fidx], alpha_t_prime=ap_i[fidx], dt=dt,
                        mask_index=midx, valid_mask=valid, last_step=last,
                        segment_ids=seg, n_segments=n_graphs_per_row)
                else:
                    res = ctmc.gat_step(
                        kk, p1, st[tok_key], alpha_t=alpha_i[fidx],
                        alpha_t_prime=ap_i[fidx], fw=samp.fw(t_i), dt=dt,
                        mask_index=midx, valid_mask=valid)
                new_st[tok_key] = res.xt

            new_prev = dst if cfg.vf.self_conditioning else prev_dst
            if visualize:
                # compact per-step frames: current tokens + predicted endpoint
                # (parity with the reference's x_t / x_1_pred trajectory
                # recording, ctmc_vector_field.py:235-255, but stacked by the
                # scan instead of per-step .cpu() copies)
                ys = dict(new_st)
                ys["x_pred"] = dst["x"]
                ys["a_pred"] = jnp.argmax(dst["a"], -1)
                ys["c_pred"] = jnp.argmax(dst["c"], -1)
                ys["e_up_pred"] = jnp.argmax(
                    ctmc.edges_to_upper(dst["e"], n), -1)
            else:
                ys = None
            return (new_st, new_prev, key), ys

        xs = (t_grid[:-1], alpha[:-1], alpha_prime[:-1],
              jnp.arange(n_timesteps - 1) == n_timesteps - 2,
              t_grid[1:] - t_grid[:-1])
        (final_state, final_dst, _), traj = jax.lax.scan(
            step, (prior_state, prev0, rng), xs)
        if visualize:
            return final_state, traj
        return final_state

    def _integrate_continuous(self, params, rng, prior_state, node_mask,
                              n_timesteps: int, visualize: bool = False,
                              simplex_project: bool = False):
        """Euler integration for endpoint / vector-field parameterizations
        (vector_field.py:388-564, 607-645). State is simplex-valued.

        `simplex_project`: project the categorical states back onto the
        probability simplex after every Euler step.  The reference never
        does this (its states drift off-simplex, vector_field.py:625-645) —
        but training only ever presents exact interpolants
        x_t = (1-a)x_0 + a*x_1, which LIVE on the simplex, so unprojected
        integration feeds the network inputs from outside its training
        distribution.  Off by default for reference parity; measured effect
        documented in trained_models/readme.md.
        """
        cfg = self.cfg
        B, n = node_mask.shape
        nm_valid = node_validity(node_mask)
        samp = cfg.sampling
        t_grid = jnp.linspace(0.0, 1.0, n_timesteps)
        alpha = cfg.schedule.alpha_t(t_grid)
        alpha_prime = cfg.schedule.alpha_t_prime(t_grid)
        is_vf = cfg.parameterization == "vector-field"

        def forward(st, t_scalar, prev_dst):
            t_vec = jnp.full((B,), t_scalar)
            return self.net.apply(params, st["x"], st["a"], st["c"], st["e"],
                                  t_vec, node_mask, prev_dst=prev_dst,
                                  apply_softmax=not is_vf,
                                  remove_com=not is_vf, deterministic=True)

        prev0 = None
        if cfg.vf.self_conditioning and not is_vf:
            prev0 = self.net.apply(
                params, prior_state["x"], prior_state["a"], prior_state["c"],
                prior_state["e"], jnp.zeros((B,)), node_mask,
                method=MolGVPNet.bootstrap)

        def step(carry, xs):
            st, prev_dst, key = carry
            t_i, alpha_i, ap_i, dt = xs
            dst = forward(st, t_i, prev_dst)
            inv_temp = samp.inv_temp(t_i)
            new_st = {}
            for feat in ("x", "a", "c", "e"):
                fidx = FEAT_INDEX[feat]
                x_t = st[feat]
                if is_vf:
                    vf = dst[feat]
                    if feat == "x":
                        vf = vf - x_t  # VectorField.forward subtracts x_t
                else:
                    vf = ap_i[fidx] / jnp.maximum(1.0 - alpha_i[fidx], 1e-9) * (
                        dst[feat] - x_t)
                    vf = vf * inv_temp
                x_s = x_t + vf * dt
                if simplex_project and feat in ("a", "c", "e"):
                    from flowmol_tpu.data.priors import simplex_proj
                    x_s = simplex_proj(x_s)
                if feat == "e":
                    # keep upper/lower triangles tied (vector_field.py:545-556)
                    x_s = ctmc.upper_to_dense(ctmc.edges_to_upper(x_s, n), n)
                if feat == "x":
                    x_s = x_s * nm_valid[..., None]
                    if is_vf:
                        x_s = remove_com(x_s, node_mask)
                new_st[feat] = x_s
            new_prev = (dst if (cfg.vf.self_conditioning and not is_vf)
                        else prev_dst)
            if visualize:
                ys = dict(new_st)
                if not is_vf:
                    # predicted-endpoint frames ({feat}_1_pred,
                    # vector_field.py:556-559); the reference's VectorField
                    # records none — no endpoint estimate exists for it
                    # (vector_field.py:463-466)
                    ys["x_pred"] = dst["x"]
                    ys["a_pred"] = dst["a"]
                    ys["c_pred"] = dst["c"]
                    ys["e_pred"] = dst["e"]
            else:
                ys = None
            return (new_st, new_prev, key), ys

        xs = (t_grid[:-1], alpha[:-1], alpha_prime[:-1], t_grid[1:] - t_grid[:-1])
        (final_state, _, _), traj = jax.lax.scan(
            step, (prior_state, prev0, rng), xs)
        if visualize:
            return final_state, traj
        return final_state

    def _integrate_dirichlet(self, params, rng, prior_state, node_mask,
                             n_timesteps: int, visualize: bool = False):
        """Dirichlet marginal-vector-field integration
        (vector_field.py:700-803), with the c_factor table resident on
        device (see fm/dirichlet.py)."""
        from flowmol_tpu.fm.dirichlet import dirichlet_marginal_step

        cfg = self.cfg
        B, n = node_mask.shape
        nm_valid = node_validity(node_mask)
        flows = self.dirichlet_flows
        t_grid = jnp.linspace(0.0, 1.0, n_timesteps)
        alpha = cfg.schedule.alpha_t(t_grid)
        alpha_prime = cfg.schedule.alpha_t_prime(t_grid)
        w_grid = alpha * cfg.dirichlet_w_max + 1.0  # alpha_to_w

        def forward(st, t_scalar, prev_dst):
            t_vec = jnp.full((B,), t_scalar)
            return self.net.apply(params, st["x"], st["a"], st["c"], st["e"],
                                  t_vec, node_mask, prev_dst=prev_dst,
                                  apply_softmax=True, remove_com=True,
                                  deterministic=True)

        prev0 = None
        if cfg.vf.self_conditioning:
            prev0 = self.net.apply(
                params, prior_state["x"], prior_state["a"], prior_state["c"],
                prior_state["e"], jnp.zeros((B,)), node_mask,
                method=MolGVPNet.bootstrap)

        def step(carry, xs):
            st, prev_dst, key = carry
            t_i, alpha_i, ap_i, w_i, w_s, dt = xs
            dst = forward(st, t_i, prev_dst)

            vf = ap_i[0] / jnp.maximum(1.0 - alpha_i[0], 1e-9) * (
                dst["x"] - st["x"])
            new_st = {"x": (st["x"] + dt * vf) * nm_valid[..., None]}

            for feat, fidx in (("a", 1), ("c", 2), ("e", 3)):
                x_t = st[feat]
                p1 = dst[feat]
                if feat == "e":
                    x_t = ctmc.edges_to_upper(x_t, n)
                    p1 = ctmc.edges_to_upper(p1, n)
                x_s = dirichlet_marginal_step(flows[feat], x_t, p1,
                                              w_i[fidx], w_s[fidx])
                if feat == "e":
                    x_s = ctmc.upper_to_dense(x_s, n)
                new_st[feat] = x_s

            new_prev = dst if cfg.vf.self_conditioning else prev_dst
            if visualize:
                ys = dict(new_st)
                ys["x_pred"] = dst["x"]
                ys["a_pred"] = dst["a"]
                ys["c_pred"] = dst["c"]
                ys["e_pred"] = dst["e"]
            else:
                ys = None
            return (new_st, new_prev, key), ys

        xs = (t_grid[:-1], alpha[:-1], alpha_prime[:-1], w_grid[:-1],
              w_grid[1:], t_grid[1:] - t_grid[:-1])
        (final_state, _, _), traj = jax.lax.scan(
            step, (prior_state, prev0, rng), xs)
        if visualize:
            return final_state, traj
        return final_state

    # ----------------------------------------------------------------- sample
    def make_sample_fn(self, n_timesteps: Optional[int] = None,
                       stochasticity: Optional[float] = None,
                       high_confidence_threshold: Optional[float] = None,
                       dfm_type: Optional[str] = None, visualize: bool = False,
                       n_graphs_per_row: Optional[int] = None,
                       simplex_project: bool = False):
        """Return a jittable (params, rng, node_mask) -> final state function.

        `node_mask` may be a bool validity mask (one molecule per row) or an
        int graph-id mask (packed rows; pass `n_graphs_per_row`)."""
        nt = n_timesteps or self.cfg.default_n_timesteps

        def fn(params, rng, node_mask):
            k_prior, k_int = jax.random.split(rng)
            prior = self.sample_prior(k_prior, node_mask)
            return self.integrate(
                params, k_int, prior, node_mask, nt,
                stochasticity=stochasticity,
                high_confidence_threshold=high_confidence_threshold,
                dfm_type=dfm_type, visualize=visualize,
                n_graphs_per_row=n_graphs_per_row,
                simplex_project=simplex_project)

        return fn
