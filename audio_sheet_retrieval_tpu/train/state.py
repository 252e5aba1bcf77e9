"""Train state and trainable/non-trainable parameter partitioning.

The reference's trainable set is lasagne ``get_all_params(trainable=True)``
(reference:utils/train_dcca_pool.py:117): conv W + BN beta/gamma per view
(CCALayer params are non-trainable; LearnedCCALayer's U/V are trainable).
The L2 penalty applies to that whole trainable set (:141-142 — lasagne
``apply_penalty`` over the trainable list, not the regularizable one).

Theano mutated shared variables; here everything is an explicit pytree:
trainable params, non-trainable running state (BN mean/inv_std + CCA state),
and the optax optimizer state, carried in a single TrainState.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from audio_sheet_retrieval_tpu.models.cca_model import ModelParams
from audio_sheet_retrieval_tpu.models.configs import ModelConfig
from audio_sheet_retrieval_tpu.ops.cca import CCAState

TRAINABLE_BLOCK_KEYS = ("w", "beta", "gamma")
STATE_BLOCK_KEYS = ("mean", "inv_std")


def split_params(params: ModelParams, cfg: ModelConfig
                 ) -> Tuple[Dict, Dict]:
    """-> (trainable, non_trainable) pytrees."""
    def split_view(view):
        t = {"blocks": [{k: b[k] for k in TRAINABLE_BLOCK_KEYS}
                        for b in view["blocks"]]}
        n = {"blocks": [{k: b[k] for k in STATE_BLOCK_KEYS}
                        for b in view["blocks"]]}
        return t, n

    t1, n1 = split_view(params.view1)
    t2, n2 = split_view(params.view2)
    trainable: Dict[str, Any] = {"view1": t1, "view2": t2}
    non_trainable: Dict[str, Any] = {"view1": n1, "view2": n2}
    if cfg.use_ccal:
        non_trainable["cca"] = params.cca
    else:
        trainable["cca_uv"] = {"U": params.cca.U, "V": params.cca.V}
        non_trainable["cca"] = params.cca._replace(
            U=jnp.zeros_like(params.cca.U), V=jnp.zeros_like(params.cca.V))
    return trainable, non_trainable


def merge_params(trainable: Dict, non_trainable: Dict,
                 cfg: ModelConfig) -> ModelParams:
    def merge_view(t, n):
        blocks = [dict(**tb, **nb) for tb, nb in
                  zip(t["blocks"], n["blocks"])]
        return {"blocks": blocks}

    cca: CCAState = non_trainable["cca"]
    if not cfg.use_ccal:
        cca = cca._replace(U=trainable["cca_uv"]["U"],
                           V=trainable["cca_uv"]["V"])
    return ModelParams(
        view1=merge_view(trainable["view1"], non_trainable["view1"]),
        view2=merge_view(trainable["view2"], non_trainable["view2"]),
        cca=cca,
    )


class TrainState(NamedTuple):
    trainable: Dict
    non_trainable: Dict
    opt_state: Any
    step: jnp.ndarray

    def params(self, cfg: ModelConfig) -> ModelParams:
        return merge_params(self.trainable, self.non_trainable, cfg)


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    """Adam with lasagne defaults (lasagne.updates.adam: b1=.9 b2=.999
    eps=1e-8, reference mutopia_ccal_cont.py:158-162), with the learning
    rate injected as a mutable hyperparameter so the refinement schedule can
    decay it without rebuilding optimizer state."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def init_train_state(params: ModelParams, cfg: ModelConfig,
                     optimizer: optax.GradientTransformation) -> TrainState:
    trainable, non_trainable = split_params(params, cfg)
    return TrainState(
        trainable=trainable,
        non_trainable=non_trainable,
        opt_state=optimizer.init(trainable),
        step=jnp.zeros((), jnp.int32),
    )


def l2_penalty(trainable: Dict) -> jnp.ndarray:
    return sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(trainable))


def l1_penalty(trainable: Dict) -> jnp.ndarray:
    return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(trainable))
