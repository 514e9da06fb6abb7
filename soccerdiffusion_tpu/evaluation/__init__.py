"""Quality-evaluation harness: recorded numbers behind the speed headlines.

The reference evaluates qualitatively (plot overlays, reference
ml/inference/plot.py:106-169); this package turns the same comparisons into
recorded metrics so sampler variants (30-step teacher, few-step/1-step
distilled students) can be ranked and regressions caught:

  * ``openloop``    — per-joint MSE/MAE vs ground truth; student-vs-teacher
    agreement on identical noise+context (the distillation objective,
    reference ml/training/distill.py:198, measured).
  * ``divergence``  — closed-loop rollout divergence under feedback through
    the batched rollout engine, plus a noise-resampling self-consistency
    yardstick.
  * ``report``      — one command producing a JSON + markdown ledger.
"""

from soccerdiffusion_tpu.evaluation.divergence import (
    closed_loop_divergence,
    rollout_chunks,
    self_consistency,
)
from soccerdiffusion_tpu.evaluation.openloop import (
    context_sensitivity,
    eval_batches,
    held_out_indices,
    open_loop_metrics,
    sampler_agreement,
    sample_trajectories,
)
from soccerdiffusion_tpu.evaluation.report import markdown_report, run_report

__all__ = [
    "closed_loop_divergence",
    "rollout_chunks",
    "self_consistency",
    "context_sensitivity",
    "eval_batches",
    "held_out_indices",
    "open_loop_metrics",
    "sampler_agreement",
    "sample_trajectories",
    "markdown_report",
    "run_report",
]
