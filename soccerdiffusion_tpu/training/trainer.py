"""The jitted training step and optimizer.

One ``pjit``-ed pure function does what the reference's Python loop body does
(reference ml/training/train.py:189-240): sample per-element timesteps,
sample noise, run forward diffusion, predict epsilon, MSE, AdamW update, LR
schedule — all fused by XLA, with the batch sharded over the mesh's data
axis and gradients psum'd over ICI by the compiler.

Optimizer matches the reference exactly: AdamW (torch defaults: betas
0.9/0.999, eps 1e-8, weight decay 1e-2) under a OneCycle cosine schedule
with torch's default shape (pct_start 0.3, div_factor 25, final_div_factor
1e4; reference train.py:162-174).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from soccerdiffusion_tpu.data.normalizer import Normalizer
from soccerdiffusion_tpu.diffusion import DiffusionSchedule, add_noise


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: core.FrozenDict | dict
    batch_stats: core.FrozenDict | dict
    opt_state: Any
    # Exponential moving average of ``params`` ({} = disabled). The
    # reference lineage trains/distributes EMA-wrapped checkpoints
    # (ema_pytorch in reference ml/preliminary/
    # train_diffusion_context_transformer_robot.py:212,260; unwrap tool
    # utils/embed_parameters.py:50-62); here EMA is a first-class train
    # option (TrainConfig.ema_decay) updated inside the jitted step.
    # Under tensor parallelism apply the same param_shardings to this
    # tree as to ``params`` (it is structure-identical).
    ema_params: core.FrozenDict | dict = struct.field(default_factory=dict)


def make_optimizer(
    lr: float,
    total_steps: int,
    weight_decay: float = 1e-2,
    use_onecycle: bool = True,
    flat: bool = False,
    module_lr_mults: dict[str, float] | None = None,
    grad_clip_norm: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW + OneCycle (torch defaults; reference train.py:162-174).

    ``flat=True`` runs the (purely elementwise) update on the raveled
    parameter vector — identical numerics in ~8 large fusions instead of
    ~8 per param tensor (training/flat_optim.py). Note the optimizer
    state becomes one flat mu/nu pair, so checkpoints do not interchange
    with ``flat=False`` ones.

    ``module_lr_mults``: {top-level param module name -> multiplier} —
    scales the post-AdamW update of that subtree (exactly equivalent to a
    per-module LR since AdamW's update is lr-linear). The round-4 camera
    lever (TrainConfig.image_encoder_lr_mult) rides this with
    ``{"image_sequence_encoder": m}``.
    """
    if use_onecycle:
        schedule = optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=lr,
            pct_start=0.3, div_factor=25.0, final_div_factor=1e4,
        )
    else:
        schedule = lr
    opt = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    if grad_clip_norm > 0.0:
        # clip BEFORE AdamW (TrainConfig.grad_clip_norm)
        opt = optax.chain(optax.clip_by_global_norm(grad_clip_norm), opt)
    if flat:
        from soccerdiffusion_tpu.training.flat_optim import flat_wrap

        opt = flat_wrap(opt)
    mults = {k: m for k, m in (module_lr_mults or {}).items() if m != 1.0}
    if mults:
        def mask_for(module: str):
            def mask(tree):
                return {k: jax.tree.map(lambda _: k == module, v)
                        for k, v in tree.items()}
            return mask

        opt = optax.chain(opt, *[
            optax.masked(optax.scale(m), mask_for(name))
            for name, m in sorted(mults.items())
        ])
    return opt


def lr_at_step(lr: float, total_steps: int, step) -> jnp.ndarray:
    """The OneCycle LR at a given step (for logging parity with the
    reference's wandb lr curve; reference train.py:231-235)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=lr,
        pct_start=0.3, div_factor=25.0, final_div_factor=1e4,
    )(step)


def create_train_state(model, sample_batch, optimizer, rng, pred_len: int,
                       num_joints: int, ema: bool = False) -> TrainState:
    """Initialize params/batch_stats and optimizer state.

    ``ema=True`` seeds ``ema_params`` with the initial params so the
    jitted step can maintain the moving average (TrainConfig.ema_decay)."""
    b = jax.tree_util.tree_leaves(sample_batch)[0].shape[0]
    noisy = jnp.zeros((b, pred_len, num_joints), dtype=jnp.float32)
    t = jnp.zeros((b,), dtype=jnp.int32)
    if getattr(model.config, "aux_cue_head", False) and model.config.use_images:
        # the lazily-created cue head only materializes params on the
        # pathway that uses it (models/policy.py forward_with_cue)
        variables = model.init(rng, sample_batch, noisy, t,
                               method=model.forward_with_cue)
    else:
        variables = model.init(rng, sample_batch, noisy, t)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        # distinct buffers: aliasing params here would make the donated
        # train step donate the same buffer twice (Execute() rejects it)
        ema_params=jax.tree.map(jnp.copy, params) if ema else {},
    )


def make_train_step(
    model,
    schedule: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    normalizer: Normalizer,
    decoder_pretraining: bool = False,
    donate: bool = True,
    ema_decay: float = 0.0,
    modality_dropout: float = 0.0,
    aux_cue_weight: float = 0.0,
) -> Callable:
    """Build the jitted train step: (state, batch, rng_seed) -> (state, metrics).

    ``rng_seed`` is a scalar int; the per-step key is derived by folding in
    the step counter, so resume reproduces the same noise stream.

    ``ema_decay > 0`` maintains ``state.ema_params`` (which must be seeded,
    ``create_train_state(ema=True)``). The effective decay warms up as
    ``min(ema_decay, (1+t)/(10+t))`` so early steps do not freeze the
    random init into the average (the role of ema_pytorch's
    update_after_step ramp in the reference lineage).

    ``modality_dropout > 0`` applies CFG-style per-sample conditioning
    dropout inside the step (data/pipeline.py dropout_modalities).
    """

    def step_fn(state: TrainState, batch: dict, rng_seed: jnp.ndarray):
        from soccerdiffusion_tpu.data.pipeline import dropout_modalities, prepare_batch

        # packed uint8 images: models with image encoders consume uint8
        # directly (normalization folded/fused model-side, perf_notes.md);
        # float conversion here only for batches the model can't take raw
        batch = prepare_batch(batch, keep_u8=model.config.use_images)
        rng = jax.random.fold_in(jax.random.key(rng_seed), state.step)
        t_key, noise_key, ctx_key = jax.random.split(rng, 3)
        if modality_dropout > 0.0:
            # fold_in rather than widening the split above: the noise/t
            # streams stay bit-identical to modality_dropout=0 runs
            batch = dropout_modalities(
                batch, jax.random.fold_in(rng, 7), modality_dropout
            )

        targets = normalizer.normalize(batch["joint_command"])
        bsz = targets.shape[0]
        t = jax.random.randint(t_key, (bsz,), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(noise_key, targets.shape, dtype=jnp.float32)
        noisy = add_noise(schedule, targets, noise, t)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            if decoder_pretraining:
                # Unconditional decoder pretraining against random context
                # tokens (reference train.py:221-226).
                hidden = model.config.hidden_dim
                ctx = jax.random.normal(ctx_key, (bsz, 10, hidden), dtype=jnp.float32)
                pred = model.apply(variables, ctx, noisy, t, method=model.denoise)
                new_stats = {}
            elif aux_cue_weight > 0.0:
                # aux cue-regression rider (ModelConfig.aux_cue_head): one
                # shared forward also predicts the newest frame's latent;
                # masked MSE against the dataset's vision_u label
                (pred, cue), mutated = model.apply(
                    variables, batch, noisy, t, train=True,
                    mutable=["batch_stats"], method=model.forward_with_cue,
                )
                new_stats = mutated.get("batch_stats", {})
                valid = batch.get(
                    "vision_u_valid", jnp.ones_like(batch["vision_u"]))
                aux = (jnp.sum(valid * jnp.square(cue - batch["vision_u"]))
                       / jnp.maximum(jnp.sum(valid), 1.0))
                eps_mse = jnp.mean(jnp.square(pred.astype(jnp.float32) - noise))
                return eps_mse + aux_cue_weight * aux, (new_stats, aux)
            else:
                pred, mutated = model.apply(
                    variables, batch, noisy, t, train=True, mutable=["batch_stats"]
                )
                new_stats = mutated.get("batch_stats", {})
            loss = jnp.mean(jnp.square(pred.astype(jnp.float32) - noise))
            return loss, (new_stats, None)

        (loss, (new_stats, aux_loss)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if ema_decay > 0.0:
            t = (state.step + 1).astype(jnp.float32)
            d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
            new_ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                                   state.ema_params, new_params)
        else:
            new_ema = state.ema_params
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats if new_stats else state.batch_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            # per-top-level-module gradient norms — the counterpart of the
            # reference's wandb run.watch(model) grad histograms (reference
            # ml/training/train.py:148); cheap scalars, one per submodule
            "grad_norms_by_layer": {
                name: optax.global_norm(sub) for name, sub in grads.items()
            },
        }
        if aux_loss is not None:
            metrics["aux_cue_loss"] = aux_loss
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
