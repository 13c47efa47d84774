"""Training-side machinery: adversarial attacks, optimizer zoo, warmup
schedules, early stopping — numpy re-expressions of the reference's training
loop components (SURVEY.md §2 T1/T2/T3).

All of these operate on ``params: dict[str, np.ndarray]`` +
``grads: dict[str, np.ndarray]`` (the numpy analog of
``model.named_parameters()``), so they compose with any gradient producer —
in this repo, the distributed logistic trainer in
``operators/train_distributed.py`` whose per-batch gradients are computed as
Spark DataFrame aggregations.

Reference parity (algorithm-for-algorithm, verified by pytest):
- FGM:  reference ``engines/utils/gan_utils.py:10-31``
- PGD:  reference ``engines/utils/gan_utils.py:34-77``
- optimizer zoo: reference ``engines/train.py:80-94`` (the six
  ``torch.optim`` choices at their public default hyperparameters, only
  ``lr`` configurable — matching how the reference constructs them)
- warmup schedules: reference ``engines/train.py:142-160``
  (``get_linear_schedule_with_warmup`` / ``get_cosine_schedule_with_warmup``
  per the published transformers formulas; warmup steps default to
  0.1 · total when configured as -1)
- early stop: reference ``engines/train.py:214-233`` (``f1 >= best`` resets
  the patience counter; strictly-worse epochs increment it; stop when
  counter exceeds ``patient``)
"""

from __future__ import annotations

import math

import numpy as np

Params = dict[str, np.ndarray]


def _l2(x: np.ndarray) -> float:
    # torch.norm default: Frobenius norm over the whole tensor
    return float(np.sqrt(np.sum(np.asarray(x, dtype=np.float64) ** 2)))


class FGM:
    """Fast Gradient Method on embedding parameters.

    Mirrors reference ``gan_utils.py:10-31``: back up the matched params,
    step them by ``epsilon * grad / ||grad||`` (skipped when the norm is 0
    or NaN), and restore exactly afterwards.
    """

    def __init__(self, params: Params):
        self.params = params
        self.backup: Params = {}

    def attack(self, grads: Params, epsilon: float = 1.0, emb_name: str = "word_embeddings.") -> None:
        for name, param in self.params.items():
            if emb_name in name and name in grads:
                self.backup[name] = param.copy()
                norm = _l2(grads[name])
                if norm != 0 and not math.isnan(norm):
                    param += (epsilon / norm) * grads[name]

    def restore(self, emb_name: str = "word_embeddings.") -> None:
        # filter on the SAME predicate attack() used (matched name AND a grad
        # entry existed): an embedding-named param with no grad never entered
        # the backup, so restoring it would KeyError — the reference filters
        # both sides identically via requires_grad (gan_utils.py:13,27)
        for name, param in self.params.items():
            if emb_name in name and name in self.backup:
                param[...] = self.backup[name]
        self.backup = {}


class PGD:
    """Projected Gradient Descent attack (K small steps projected back onto
    the ε-ball around the original embedding). Mirrors reference
    ``gan_utils.py:34-77`` including the grad backup/restore protocol used
    by the K-step training loop (``train.py:185-196``)."""

    def __init__(self, params: Params):
        self.params = params
        self.emb_backup: Params = {}
        self.grad_backup: Params = {}

    def attack(
        self,
        grads: Params,
        epsilon: float = 1.0,
        alpha: float = 0.3,
        emb_name: str = "word_embeddings.",
        is_first_attack: bool = False,
    ) -> None:
        for name, param in self.params.items():
            if emb_name in name and name in grads:
                if is_first_attack:
                    self.emb_backup[name] = param.copy()
                norm = _l2(grads[name])
                if norm != 0 and not math.isnan(norm):
                    param += (alpha / norm) * grads[name]
                    param[...] = self.project(name, param, epsilon)

    def project(self, param_name: str, param_data: np.ndarray, epsilon: float) -> np.ndarray:
        r = param_data - self.emb_backup[param_name]
        if _l2(r) > epsilon:
            r = (epsilon / _l2(r)) * r
        return self.emb_backup[param_name] + r

    def restore(self, emb_name: str = "word_embeddings.") -> None:
        # same symmetric filtering as FGM.restore (see comment there)
        for name, param in self.params.items():
            if emb_name in name and name in self.emb_backup:
                param[...] = self.emb_backup[name]
        self.emb_backup = {}

    def backup_grad(self, grads: Params) -> None:
        self.grad_backup = {k: (None if v is None else v.copy()) for k, v in grads.items()}

    def restore_grad(self) -> Params:
        return {k: (None if v is None else v.copy()) for k, v in self.grad_backup.items()}


# ---------------------------------------------------------------------------
# optimizer zoo (reference train.py:80-94 — torch.optim defaults, lr only)


class Optimizer:
    def __init__(self, params: Params, lr: float):
        self.params = params
        self.lr = lr
        self.t = 0

    def step(self, grads: Params) -> None:
        self.t += 1
        for name, p in self.params.items():
            g = grads.get(name)
            if g is not None:
                self._update(name, p, np.asarray(g, dtype=p.dtype))

    def _update(self, name: str, p: np.ndarray, g: np.ndarray) -> None:
        raise NotImplementedError


class SGD(Optimizer):
    def _update(self, name, p, g):
        p -= self.lr * g


class Adagrad(Optimizer):
    """torch defaults: lr_decay=0, eps=1e-10."""

    def __init__(self, params, lr, eps: float = 1e-10):
        super().__init__(params, lr)
        self.eps = eps
        self.sum = {k: np.zeros_like(v) for k, v in params.items()}

    def _update(self, name, p, g):
        self.sum[name] += g * g
        p -= self.lr * g / (np.sqrt(self.sum[name]) + self.eps)


class Adadelta(Optimizer):
    """torch defaults: rho=0.9, eps=1e-6."""

    def __init__(self, params, lr, rho: float = 0.9, eps: float = 1e-6):
        super().__init__(params, lr)
        self.rho, self.eps = rho, eps
        self.sq = {k: np.zeros_like(v) for k, v in params.items()}
        self.acc = {k: np.zeros_like(v) for k, v in params.items()}

    def _update(self, name, p, g):
        self.sq[name] = self.rho * self.sq[name] + (1 - self.rho) * g * g
        delta = np.sqrt(self.acc[name] + self.eps) / np.sqrt(self.sq[name] + self.eps) * g
        p -= self.lr * delta
        self.acc[name] = self.rho * self.acc[name] + (1 - self.rho) * delta * delta


class RMSprop(Optimizer):
    """torch defaults: alpha=0.99, eps=1e-8."""

    def __init__(self, params, lr, alpha: float = 0.99, eps: float = 1e-8):
        super().__init__(params, lr)
        self.alpha, self.eps = alpha, eps
        self.sq = {k: np.zeros_like(v) for k, v in params.items()}

    def _update(self, name, p, g):
        self.sq[name] = self.alpha * self.sq[name] + (1 - self.alpha) * g * g
        p -= self.lr * g / (np.sqrt(self.sq[name]) + self.eps)


class Adam(Optimizer):
    """torch defaults: betas=(0.9, 0.999), eps=1e-8, weight_decay=0."""

    def __init__(self, params, lr, betas=(0.9, 0.999), eps: float = 1e-8):
        super().__init__(params, lr)
        self.b1, self.b2 = betas
        self.eps = eps
        self.m = {k: np.zeros_like(v) for k, v in params.items()}
        self.v = {k: np.zeros_like(v) for k, v in params.items()}

    def _update(self, name, p, g):
        self.m[name] = self.b1 * self.m[name] + (1 - self.b1) * g
        self.v[name] = self.b2 * self.v[name] + (1 - self.b2) * g * g
        mhat = self.m[name] / (1 - self.b1**self.t)
        vhat = self.v[name] / (1 - self.b2**self.t)
        p -= self.lr * mhat / (np.sqrt(vhat) + self.eps)


class AdamW(Adam):
    """torch defaults: Adam + decoupled weight decay 0.01 applied BEFORE the
    Adam update (p ← p − lr·wd·p)."""

    def __init__(self, params, lr, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.01):
        super().__init__(params, lr, betas, eps)
        self.wd = weight_decay

    def _update(self, name, p, g):
        p -= self.lr * self.wd * p
        super()._update(name, p, g)


OPTIMIZERS = {
    "Adagrad": Adagrad,
    "Adadelta": Adadelta,
    "RMSprop": RMSprop,
    "SGD": SGD,
    "Adam": Adam,
    "AdamW": AdamW,
}


def make_optimizer(name: str, params: Params, lr: float) -> Optimizer:
    """Reference ``train.py:80-94``: six choices, anything else raises."""
    if name not in OPTIMIZERS:
        raise ValueError("optimizer_type does not exist")
    return OPTIMIZERS[name](params, lr)


# ---------------------------------------------------------------------------
# warmup schedules (reference train.py:142-160)


def linear_warmup_factor(step: int, num_warmup_steps: float, num_training_steps: float) -> float:
    """transformers.get_linear_schedule_with_warmup's lr multiplier."""
    if step < num_warmup_steps:
        return step / max(1.0, num_warmup_steps)
    return max(
        0.0,
        (num_training_steps - step) / max(1.0, num_training_steps - num_warmup_steps),
    )


def cosine_warmup_factor(
    step: int, num_warmup_steps: float, num_training_steps: float, num_cycles: float = 0.5
) -> float:
    """transformers.get_cosine_schedule_with_warmup's lr multiplier."""
    if step < num_warmup_steps:
        return step / max(1.0, num_warmup_steps)
    progress = (step - num_warmup_steps) / max(1.0, num_training_steps - num_warmup_steps)
    return max(0.0, 0.5 * (1.0 + math.cos(math.pi * num_cycles * 2.0 * progress)))


def warmup_schedule(
    scheduler_type: str, num_warmup_steps: int, num_training_steps: int
):
    """Reference ``train.py:142-160``: 'linear' | 'cosine', warmup=-1 means
    10% of total steps; returns step → lr multiplier."""
    warm = num_training_steps * 0.1 if num_warmup_steps == -1 else float(num_warmup_steps)
    if scheduler_type == "linear":
        return lambda step: linear_warmup_factor(step, warm, num_training_steps)
    if scheduler_type == "cosine":
        return lambda step: cosine_warmup_factor(step, warm, num_training_steps)
    raise ValueError("scheduler_type does not exist")


# ---------------------------------------------------------------------------
# early stopping (reference train.py:214-233)


class EarlyStopper:
    """``f1 >= best`` is an improvement (resets patience and moves best —
    note the reference treats TIES as improvements); stop once the count of
    consecutive non-improving epochs EXCEEDS ``patient``."""

    def __init__(self, patient: int):
        self.patient = patient
        self.best = 0.0
        self.best_epoch = 0
        self.unprocessed = 0

    def update(self, epoch: int, f1: float) -> bool:
        """Record an epoch result; True → stop now."""
        if f1 >= self.best:
            self.unprocessed = 0
            self.best = f1
            self.best_epoch = epoch
        else:
            self.unprocessed += 1
        return self.unprocessed > self.patient
