"""Open-loop quality evaluation: per-joint errors on held-out windows.

Counterpart of the reference's offline eval plot semantics (reference
ml/inference/plot.py:106-169: sample dataset items, run the full sampler or
the distilled forward, compare against the ground-truth future commands) —
but producing RECORDED numbers instead of pictures, so sampler variants
(30-step teacher vs few-step distilled students) can be ranked:

  * ``open_loop_metrics``    — denoised trajectory vs dataset target:
    overall/per-joint MSE + MAE in the denormalized [0, 2pi) joint domain.
  * ``sampler_agreement``    — student vs teacher on IDENTICAL noise and
    context (the distillation objective itself, reference
    ml/training/distill.py:198, measured instead of trained).

Both evaluate a deterministic, seeded window subset so runs are comparable
across checkpoints.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.diffusion import DiffusionSchedule, solver_label, solver_sample


def sample_trajectories(model, variables, schedule: DiffusionSchedule, context,
                        noise, num_steps: int, distilled: bool,
                        solver: str = "ddim",
                        uncond_context: jnp.ndarray | None = None,
                        guidance_scale: float = 1.0) -> jnp.ndarray:
    """Run the checkpoint's sampler on encoded context; normalized domain.

    ``distilled`` selects the single forward at t=0 (reference
    ros.py:293-298); otherwise ``num_steps`` steps of ``solver`` — "ddim"
    (ros.py:301-310) or "dpmpp" (DPM-Solver++(2M),
    diffusion/dpm_solver.py, training-free few-step).

    ``uncond_context`` + ``guidance_scale`` enable classifier-free guidance
    for the iterative samplers: each step predicts epsilon under BOTH
    contexts in one doubled-batch denoiser pass and combines them as
    ``eps_u + w (eps_c - eps_u)`` (Ho & Salimans 2022; w=1 is plain
    conditional sampling). The unconditional context comes from
    data/pipeline.py null_modalities — in-distribution for
    ``modality_dropout``-trained checkpoints. Guidance is undefined for
    the distilled single-forward student (its output is a trajectory,
    not a score) and is rejected there.
    """
    bsz = noise.shape[0]
    guided = uncond_context is not None and guidance_scale != 1.0
    if distilled:
        if guided:
            raise ValueError("classifier-free guidance requires an "
                             "iterative sampler; the distilled student's "
                             "single forward is not a score prediction")
        return model.apply(variables, context, noise,
                           jnp.zeros((bsz,), jnp.int32), method=model.denoise)

    if guided:
        ctx2 = jnp.concatenate([context, uncond_context], axis=0)

        def denoise_fn(x, t):
            x2 = jnp.concatenate([x, x], axis=0)
            eps2 = model.apply(variables, ctx2, x2,
                               jnp.full((2 * bsz,), t, jnp.int32),
                               method=model.denoise)
            eps_c, eps_u = eps2[:bsz], eps2[bsz:]
            return eps_u + guidance_scale * (eps_c - eps_u)
    else:
        def denoise_fn(x, t):
            return model.apply(variables, context, x,
                               jnp.full((bsz,), t, jnp.int32),
                               method=model.denoise)

    return solver_sample(schedule, denoise_fn, noise, num_steps, solver=solver)


def eval_batches(dataset, indices: Sequence[int], batch_size: int):
    """Yield stacked batches over explicit window ``indices`` (the held-out
    eval subset), deterministically ordered."""
    for lo in range(0, len(indices), batch_size):
        chunk = [dataset[int(i)] for i in indices[lo:lo + batch_size]]
        yield {k: np.stack([c[k] for c in chunk]) for k in chunk[0]}


def held_out_indices(dataset_len: int, num_windows: int, seed: int = 0) -> np.ndarray:
    """Deterministic, seeded subset of window indices for evaluation."""
    rng = np.random.default_rng(seed)
    n = min(num_windows, dataset_len)
    return np.sort(rng.choice(dataset_len, size=n, replace=False))


def open_loop_metrics(model, variables, normalizer, schedule: DiffusionSchedule,
                      dataset, indices: Sequence[int], num_steps: int,
                      distilled: bool, batch_size: int = 64,
                      seed: int = 0, solver: str = "ddim",
                      shuffle_keys: Sequence[str] | None = None,
                      guidance_scale: float = 1.0,
                      guidance_null: Sequence[str] | None = None,
                      mean_of: int = 1) -> dict:
    """Denoised trajectory vs ground-truth future commands over ``indices``.

    Returns overall + per-joint MSE/MAE in the denormalized joint domain
    (radians, [0, 2pi) convention), plus the noise-floor MSE of predicting
    pure denormalized noise — the "beats noise" reference point.

    ``mean_of > 1`` evaluates the POSTERIOR-MEAN estimator: average
    ``mean_of`` sampled trajectories (independent start noise, same
    context) before the error. A single diffusion draw carries the full
    posterior variance, which an MSE against a deterministic target counts
    as error — the Bayes-oracle rows (evaluation/oracle.py) are
    conditional means, so matching estimator classes requires averaging.
    Labelled ``xmeanK`` so single-draw and posterior-mean rows can never
    be confused.

    ``shuffle_keys`` (e.g. :data:`IMAGE_KEYS`) permutes those batch entries
    across the batch before encoding — an ablation of one conditioning
    modality while the targets stay honest. The MSE gap between a true run
    and a shuffled run measures how much that modality contributes to the
    *trajectory-level* prediction (the image-conditioned quality evidence).

    ``guidance_scale`` != 1 with ``guidance_null`` (modality names for
    data/pipeline.py null_modalities, e.g. ``("image",)``) samples with
    classifier-free guidance: the unconditional branch nulls those
    modalities and the combined score amplifies their contribution by
    ``guidance_scale``. Meaningful on ``modality_dropout``-trained
    checkpoints; iterative samplers only.
    """
    shuffle_rng = (np.random.default_rng(seed + 23)
                   if shuffle_keys is not None else None)
    se_sum = ae_sum = noise_se_sum = None
    count = 0
    for b, batch in enumerate(eval_batches(dataset, indices, batch_size)):
        if shuffle_rng is not None:
            perm = shuffle_rng.permutation(len(batch["joint_command"]))
            for k in shuffle_keys:
                if k in batch:
                    batch[k] = batch[k][perm]
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        bsz = jb["joint_command"].shape[0]
        shape = (bsz, model.config.trajectory_prediction_length,
                 model.config.num_joints)
        noise = jax.random.normal(jax.random.key(seed + b), shape, jnp.float32)
        context = model.apply(variables, jb, False, method=model.encode_context)
        uncond = None
        if guidance_null is not None and guidance_scale != 1.0:
            from soccerdiffusion_tpu.data.pipeline import null_modalities

            jb_u = null_modalities(jb, guidance_null)
            uncond = model.apply(variables, jb_u, False,
                                 method=model.encode_context)
        traj = sample_trajectories(model, variables, schedule, context, noise,
                                   num_steps, distilled, solver=solver,
                                   uncond_context=uncond,
                                   guidance_scale=guidance_scale)
        if mean_of > 1:
            for m in range(1, mean_of):
                noise_m = jax.random.normal(
                    jax.random.key(seed + b + 7919 * m), shape, jnp.float32)
                traj = traj + sample_trajectories(
                    model, variables, schedule, context, noise_m, num_steps,
                    distilled, solver=solver, uncond_context=uncond,
                    guidance_scale=guidance_scale)
            traj = traj / mean_of
        traj = normalizer.denormalize(traj)
        target = jb["joint_command"].astype(jnp.float32)
        err = np.asarray(traj.astype(jnp.float32) - target)  # (B, P, J)
        noise_err = np.asarray(
            normalizer.denormalize(noise).astype(jnp.float32) - target)
        se = np.sum(np.square(err), axis=(0, 1))  # (J,)
        ae = np.sum(np.abs(err), axis=(0, 1))
        nse = np.sum(np.square(noise_err), axis=(0, 1))
        se_sum = se if se_sum is None else se_sum + se
        ae_sum = ae if ae_sum is None else ae_sum + ae
        noise_se_sum = nse if noise_se_sum is None else noise_se_sum + nse
        count += bsz * model.config.trajectory_prediction_length
    per_joint_mse = se_sum / count
    per_joint_mae = ae_sum / count
    label = "distilled1" if distilled else solver_label(solver, num_steps)
    if guidance_null is not None and guidance_scale != 1.0:
        null = (guidance_null,) if isinstance(guidance_null, str) else guidance_null
        label += f"+cfg{guidance_scale:g}({','.join(null)})"
    if mean_of > 1:
        label += f"xmean{mean_of}"
    return {
        "num_windows": int(len(indices)),
        "sampler": label,
        "mse": float(per_joint_mse.mean()),
        "mae": float(per_joint_mae.mean()),
        "noise_floor_mse": float((noise_se_sum / count).mean()),
        "per_joint_mse": {
            name: float(v)
            for name, v in zip(model.config.joint_names, per_joint_mse)
        },
    }


#: batch keys that carry conditioning information (everything the policy
#: encodes except the denoised target itself)
CONTEXT_KEYS = ("joint_command_history", "joint_state", "rotation",
                "image_u8", "image_valid", "image_data", "game_state")

#: the camera modality's batch keys (shuffled together for the
#: image-only sensitivity probe; stamps ride along for consistency)
IMAGE_KEYS = ("image_u8", "image_valid", "image_data", "image_stamps")


def context_sensitivity(model, variables, normalizer,
                        schedule: DiffusionSchedule,
                        dataset, indices: Sequence[int],
                        t_fracs: Sequence[float] = (0.1, 0.5, 0.9),
                        batch_size: int = 64, seed: int = 0,
                        keys: Sequence[str] = CONTEXT_KEYS,
                        variants: dict[str, Sequence[str]] | None = None) -> dict:
    """Does the model actually USE its context? eps-MSE with true vs
    batch-shuffled context, per diffusion-timestep fraction.

    A conditional denoiser must predict noise better when each sample sees
    its OWN context than when contexts are permuted across the batch; a
    ratio near 1.0 at every t means the model learned only unconditional
    denoising (this exact diagnosis caught the lr-1e-4 quality-ledger
    teacher ignoring its context, docs/ROUND3.md). Returns per-t-fraction
    true/shuffled eps-MSE and their ratio (shuffled/true; >1 is good).

    ``keys`` selects which batch entries are permuted: all context
    (default) or a single modality (e.g. :data:`IMAGE_KEYS` measures
    whether the CAMERA specifically is used, with every other modality
    kept honest). ``variants`` (name -> key tuple) evaluates several
    shuffled variants against ONE shared true-side pass (same per-batch
    permutation and noise draws as separate calls, so the numbers are
    identical — the true-side encode/denoise work just isn't repeated);
    the return value is then ``{name: result}``.
    """
    import numpy as _np

    single = variants is None
    if single:
        variants = {"context": tuple(keys)}
    rng = _np.random.default_rng(seed + 17)
    true_se = {f: 0.0 for f in t_fracs}
    shuf_se = {name: {f: 0.0 for f in t_fracs} for name in variants}
    count = 0
    T = schedule.num_train_timesteps
    for b, batch in enumerate(eval_batches(dataset, indices, batch_size)):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        bsz = jb["joint_command"].shape[0]
        perm = rng.permutation(bsz)
        ctx_true = model.apply(variables, jb, False, method=model.encode_context)
        ctx_shuf = {}
        for name, ks in variants.items():
            jb_sh = dict(jb)
            for k in ks:
                if k in jb_sh:
                    jb_sh[k] = jb_sh[k][perm]
            ctx_shuf[name] = model.apply(variables, jb_sh, False,
                                         method=model.encode_context)
        # normalized domain — matches the training objective exactly
        x0 = normalizer.normalize(jb["joint_command"].astype(jnp.float32))
        eps = jax.random.normal(jax.random.key(seed + b), x0.shape, jnp.float32)
        for f in t_fracs:
            t = jnp.full((bsz,), int(f * (T - 1)), jnp.int32)
            from soccerdiffusion_tpu.diffusion import add_noise

            xt = add_noise(schedule, x0, eps, t)
            pt = model.apply(variables, ctx_true, xt, t, method=model.denoise)
            true_se[f] += float(jnp.sum((pt - eps) ** 2))
            for name, ctx in ctx_shuf.items():
                ps = model.apply(variables, ctx, xt, t, method=model.denoise)
                shuf_se[name][f] += float(jnp.sum((ps - eps) ** 2))
        count += int(eps.size)
    results = {}
    for name in variants:
        out = {"num_windows": int(len(indices)), "per_t": {}}
        for f in t_fracs:
            ts, ss = true_se[f], shuf_se[name][f]
            out["per_t"][f"{f:.2f}"] = {
                "eps_mse_true": ts / count,
                "eps_mse_shuffled": ss / count,
                "ratio": (ss / ts) if ts > 0 else float("nan"),
            }
        ratios = [v["ratio"] for v in out["per_t"].values()]
        out["min_ratio"] = min(ratios)
        results[name] = out
    return results["context"] if single else results


def sampler_agreement(model, teacher_vars, student_vars, normalizer,
                      schedule: DiffusionSchedule, dataset,
                      indices: Sequence[int], teacher_steps: int,
                      student_steps: int, student_distilled: bool,
                      batch_size: int = 64, seed: int = 0,
                      student_solver: str = "ddim") -> dict:
    """Student-vs-teacher trajectory error on identical noise.

    Each checkpoint encodes the context with its OWN params — this measures
    the deployed student end-to-end. For students from
    ``training/distill.py`` the encodings are bit-identical anyway: only
    the denoiser/step-token are trainable there (the optimizer is masked,
    matching the reference where frozen params never enter optimizer.step),
    so the comparison reduces to the distillation objective (reference
    distill.py:198) while staying honest for any future
    finetuned-encoder student. Returns MSE/MAE, denormalized joint domain.
    """
    se_sum = ae_sum = 0.0
    count = 0
    for b, batch in enumerate(eval_batches(dataset, indices, batch_size)):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        bsz = jb["joint_command"].shape[0]
        shape = (bsz, model.config.trajectory_prediction_length,
                 model.config.num_joints)
        noise = jax.random.normal(jax.random.key(seed + b), shape, jnp.float32)
        t_ctx = model.apply(teacher_vars, jb, False, method=model.encode_context)
        s_ctx = model.apply(student_vars, jb, False, method=model.encode_context)
        t_traj = sample_trajectories(model, teacher_vars, schedule, t_ctx,
                                     noise, teacher_steps, False)
        s_traj = sample_trajectories(model, student_vars, schedule, s_ctx,
                                     noise, student_steps, student_distilled,
                                     solver=student_solver)
        diff = np.asarray(
            normalizer.denormalize(s_traj).astype(jnp.float32)
            - normalizer.denormalize(t_traj).astype(jnp.float32))
        se_sum += float(np.sum(np.square(diff)))
        ae_sum += float(np.sum(np.abs(diff)))
        count += diff.size
    return {
        "num_windows": int(len(indices)),
        "teacher": f"ddim{teacher_steps}",
        "student": ("distilled1" if student_distilled
                    else solver_label(student_solver, student_steps)),
        "mse_vs_teacher": se_sum / count,
        "mae_vs_teacher": ae_sum / count,
    }
