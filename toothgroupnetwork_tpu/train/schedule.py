"""Learning-rate schedules.

The reference uses the timm-derived cosine scheduler stepped once per epoch
(external_libs/scheduler/cosine_lr.py via scheduler_factory.py:11-118; all configs set
``sched='cosine', full_steps=40`` and a schedueler_step so large it only fires at
epoch end, SURVEY.md §2.5). We reproduce that as a pure ``epoch -> lr`` function whose
value is injected into the optimizer each epoch (no recompilation).
"""

from __future__ import annotations

import math

from .config import OptimizerConfig, SchedulerConfig


def make_epoch_lr_fn(opt: OptimizerConfig, sched: SchedulerConfig):
    """Returns ``lr(epoch: int) -> float``.

    cosine: timm CosineLRScheduler contract with cycle_limit=1 —
      warmup epochs ramp linearly to base lr, then
      ``min_lr + 0.5*(lr−min_lr)*(1+cos(pi*t/T))`` for t in [0, T), clamped to
      ``min_lr`` afterwards.
    exp: torch ExponentialLR per epoch.
    """
    base = opt.lr

    if sched.sched == "cosine":
        t_total = sched.full_steps
        warm = sched.warmup_epochs
        min_lr = sched.min_lr

        def lr_fn(epoch: int) -> float:
            if warm > 0 and epoch < warm:
                return base * (epoch + 1) / warm
            t = epoch - warm
            if t >= t_total:
                return min_lr
            return min_lr + 0.5 * (base - min_lr) * (1 + math.cos(math.pi * t / t_total))

        return lr_fn

    if sched.sched == "exp":
        def lr_fn(epoch: int) -> float:
            return base * (sched.step_decay ** epoch)

        return lr_fn

    if sched.sched == "constant":
        return lambda epoch: base

    if sched.sched == "step":
        # timm StepLRScheduler contract: decay by step_decay every full_steps epochs
        def lr_fn(epoch: int) -> float:
            return base * (sched.step_decay ** (epoch // max(sched.full_steps, 1)))

        return lr_fn

    raise ValueError(f"unknown scheduler {sched.sched!r}")
